package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: time the q-gram linkage variants on the q_fuzzy_qgram
  * fixture — old direct-capped path vs adaptive (fast / engaged branch)
  * vs plain uncapped — to pick the adaptive `smallVolume` threshold from
  * measurement. args: [sfDir [variantSubstrings [runs]]] — variants is a
  * comma-list matched by substring against the tags below (default:
  * all), runs per variant (default 3).
  * Backs: Linkage adaptive smallVolume threshold (NOTES_r12 measurement) + SCALE.md fuzzy rows.
  */
object LinkTime {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val only = if (args.length > 1) args(1).split(",").toSeq else Nil
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def corpus = docs.select(col("doc_id"), substring(col("text"), 1, 40).as("name"))
    def dirty = docs.filter(col("doc_id") < 200).select(
      col("doc_id"),
      concat(substring(col("text"), 1, 6), substring(col("text"), 8, 33)).as("name"))
    def time(tag: String)(f: => DataFrame): Unit = {
      if (only.nonEmpty && !only.exists(tag.contains)) return
      (1 to runs).foreach { i =>
        graft.ops.Linkage.releaseCaches()
        val t0 = System.nanoTime()
        val n = f.count()
        println(f"$tag%-22s run$i: ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
      }
    }
    time("capped-direct") {
      graft.ops.Linkage.qgramPairs(dirty, corpus, "doc_id", "name",
        maxDist = 2, q = 3, maxDfRatio = Some(0.1), countPrune = false)
    }
    time("adaptive-default") {
      graft.ops.Linkage.qgramPairsAdaptive(dirty, corpus, "doc_id", "name",
        maxDist = 2, q = 3, maxDfRatio = 0.1, countPrune = false)
    }
    time("adaptive-forced-fast") {
      graft.ops.Linkage.qgramPairsAdaptive(dirty, corpus, "doc_id", "name",
        maxDist = 2, q = 3, maxDfRatio = 0.1, engageFactor = 1e18,
        countPrune = false)
    }
    time("uncapped-direct") {
      graft.ops.Linkage.qgramPairs(dirty, corpus, "doc_id", "name",
        maxDist = 2, q = 3, countPrune = false)
    }
    time("adaptive+orderBy") {
      graft.ops.Linkage.qgramPairsAdaptive(dirty, corpus, "doc_id", "name",
        maxDist = 2, q = 3, maxDfRatio = 0.1, countPrune = false)
        .orderBy("left_id", "right_id")
    }
    // the bench harness's exact action: noop sink, no cache release
    if (only.isEmpty || only.exists("bench-shape".contains))
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      graft.ops.Linkage.qgramPairsAdaptive(dirty, corpus, "doc_id", "name",
        maxDist = 2, q = 3, maxDfRatio = 0.1, countPrune = false)
        .orderBy("left_id", "right_id")
        .write.mode("overwrite").format("noop").save()
      println(f"bench-shape            run$i: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
