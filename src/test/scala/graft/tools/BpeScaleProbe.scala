package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Backs: the BpeTokens scaladoc's memo/rank-map economics claim at
  * PRODUCTION vocab scale (VERDICT r16 item 5) — times the q_text_bpe
  * dataflow (sum of per-doc token counts) with the 64-merge fixture
  * table vs a 50,000-merge `merges.txt` loaded through Bpe.parseMerges,
  * at sf0.1 and the 100x documents replica, and reports the measured
  * memo hit rate and per-task rank-map rebuild cost.
  *
  * Usage: Test/runMain graft.tools.BpeScaleProbe [dir ...]
  * Defaults: /root/testdata/sf0.1 /tmp/replica100
  */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/root/testdata/sf0.1", "/tmp/replica100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val m50k = graft.functions.Bpe.parseMerges(
      graft.functions.Bpe.mergesAtScaleBody(50000))
    val bt = graft.functions.BpeTokens

    for (dir <- dirs) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      docs.count() // warm scan
      for ((label, table) <- Seq(
          "64-merge " -> graft.functions.Bpe.DefaultMerges,
          "50k-merge" -> m50k)) {
        val times = (1 to 3).map { _ =>
          bt.resetCounters()
          bt.countersEnabled = true
          val t0 = System.nanoTime()
          docs.select(size(graft.functions.Bpe.tokens(col("text"), table)).as("n"))
            .agg(sum(col("n"))).collect()
          val sec = (System.nanoTime() - t0) / 1e9
          bt.countersEnabled = false
          sec
        }
        val hits = bt.memoHits.get(); val misses = bt.memoMisses.get()
        val builds = bt.rankMapBuilds.get()
        val buildMs = bt.rankMapBuildNanos.get() / 1e6
        println(f"$dir $label best=${times.min}%.2fs all=${times.map(t => f"$t%.2f").mkString(",")} " +
          f"memo=${hits * 100.0 / math.max(1, hits + misses)}%.2f%% " +
          f"(misses=$misses) builds=$builds buildMs=$buildMs%.1f")
      }
    }
    spark.stop()
  }
}
