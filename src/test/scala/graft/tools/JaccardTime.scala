package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time the jaccard variants on a documents.parquet directory
  * (scale replicas included) in one JVM, cache-cold per variant.
  * args: dir [variants]  where variants ⊆ uncapped,capped,adaptive
  * (default adaptive). Mirrors the SCALE.md round-5 protocol (isolated
  * timing per variant, releaseCaches between).
  * Backs: SCALE.md dedup-family replica tables (round-5 isolated protocol; r15 100x refresh).
  */
object JaccardTime {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val variants = if (args.length > 1) args(1).split(",").toSeq
      else Seq("adaptive")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    variants.foreach { v =>
      graft.ops.Dedup.releaseCaches()
      val t0 = System.nanoTime()
      val df = v match {
        case "uncapped" =>
          graft.ops.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
        case "capped" =>
          graft.ops.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8,
            maxDf = Some(50))
        case "adaptive" =>
          graft.ops.Dedup.jaccardPairsAdaptive(docs, "doc_id", "text", 3, 0.8,
            cap = 50)
      }
      val n = df.count()
      println(f"jaccard-$v%-10s ${(System.nanoTime() - t0) / 1e9}%8.2f s  pairs=$n")
    }
    spark.stop()
  }
}
