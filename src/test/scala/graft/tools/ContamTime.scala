package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev tool: time exact vs bloom-reduced decontamination with a FIXED
  * eval suite against a growing train corpus — the real decontamination
  * shape (benchmarks are fixed artifacts; only the crawl grows). The
  * benched `q_contam_*` fixture slices eval out of the SAME corpus, so
  * its eval side scales with the train side and understates the bloom
  * reduction. args: evalDir trainDir [variants ⊆ exact,bloom]
  * Backs: SCALE.md contamination fixed-eval scaling rows.
  */
object ContamTime {
  def main(args: Array[String]): Unit = {
    val evalDir = args(0)
    val trainDir = args(1)
    val variants = if (args.length > 2) args(2).split(",").toSeq
      else Seq("exact", "bloom")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // fixed eval suite: the sf0.1 corpus's % 7 slice (~714 docs);
    // train: everything in the (replicated) corpus that is not an eval
    // replica-0 row — id collisions across dirs don't matter for timing
    val eval = spark.read.parquet(s"$evalDir/documents.parquet")
      .filter(col("doc_id") % 7 === 0)
    val train = spark.read.parquet(s"$trainDir/documents.parquet")
      .filter(col("doc_id") % 7 =!= 0)
    variants.foreach { v =>
      val t0 = System.nanoTime()
      val df = v match {
        case "exact" =>
          graft.ops.Contamination.containmentPairs(
            train, eval, "doc_id", "text", 3, 0.5)
        case "bloom" =>
          graft.ops.Contamination.containmentPairsBloom(
            train, eval, "doc_id", "text", 3, 0.5)
      }
      val n = df.count()
      println(f"contam-$v%-6s ${(System.nanoTime() - t0) / 1e9}%8.2f s  pairs=$n")
    }
    spark.stop()
  }
}
