package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: print the adaptive-jaccard probe statistics for a fixture
  * dir — Σdf, Σdf², the projected uncapped/capped volumes, and the
  * engage decision at the given cap/factor. args: sfDir [cap] [factor].
  * Backs: the adaptive-cap engage thresholds in Dedup.jaccardPairsAdaptive scaladoc + SCALE.md df-cap rows.
  */
object DfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cap = if (args.length > 1) args(1).toInt else 50
    val factor = if (args.length > 2) args(2).toDouble else 4.0
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val index = docs.select(col("doc_id"),
      explode(graft.functions.ShingleHashes.shingleHashes(col("text"), 3)).as("shash"))
    val s = index.groupBy("shash").agg(count(lit(1)).as("df"))
      .agg(sum(col("df").cast("double")).as("sum_df"),
        sum((col("df") * col("df")).cast("double")).as("sum_df2"),
        sum(when(col("df") <= cap, (col("df") * col("df")).cast("double"))
          .otherwise(0.0)).as("sum_df2_capped"),
        max("df").as("max_df"), count(lit(1)).as("n_shingles"))
      .head()
    val (sumDf, sumDf2, sumDf2Cap) =
      (s.getDouble(0), s.getDouble(1), s.getDouble(2))
    println(f"sum_df=$sumDf%.3e sum_df2=$sumDf2%.3e sum_df2_capped=$sumDf2Cap%.3e " +
      f"max_df=${s.getLong(3)} shingles=${s.getLong(4)} " +
      f"uncappedVol=${sumDf2 / 2}%.3e cappedVol=${sumDf2Cap / 2}%.3e " +
      f"ratio=${sumDf2 / math.max(sumDf2Cap, 1.0)}%.2f")
    spark.stop()
  }
}
