package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: A/B the incremental-dedup corpus-index forms on a
  * documents.parquet directory — per-batch cross-pair cost against
  *
  *   inline    — rebuild the corpus index inside every batch run (the
  *               q_dedup_incremental query shape; session caches only)
  *   cached    — one prebuilt in-memory [[graft.ops.Dedup.CorpusIndex]]
  *               probed by every batch (single-session production)
  *   bucketed  — the [[graft.ops.Dedup.persistCorpusIndex]] SMB disk
  *               layout reopened via the catalog (cross-session
  *               production; corpus side pre-partitioned on disk)
  *
  * args: dir [batches] — the even-id half is the corpus, the odd-id half
  * splits into `batches` (default 3) round-robin batches. Caches are
  * released between FORMS, kept across a form's batches (that's each
  * form's steady state). Numbers feed SCALE.md's A/B table.
  * Backs: SCALE.md incremental corpus-index rows (inline vs persisted index A/B).
  */
object IncrTime {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val batches = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Dedup
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    def batch(i: Int) = docs.filter(col("doc_id") % 2 === 1 &&
      (col("doc_id") - 1) / 2 % batches === i)

    def timeBatches(name: String)(pairsOf: Int => org.apache.spark.sql.DataFrame): Unit = {
      var total = 0L
      var t0 = System.nanoTime()
      val first = { pairsOf(0).count(); (System.nanoTime() - t0) / 1e6 }
      (1 until batches).foreach { i =>
        t0 = System.nanoTime(); pairsOf(i).count()
        total += System.nanoTime() - t0
      }
      val steady = if (batches > 1) total / 1e6 / (batches - 1) else first
      println(f"[incrtime] $name%-9s first=$first%8.1f ms  steady/batch=$steady%8.1f ms")
    }

    // inline: rebuild per batch (shingle caches released per batch too —
    // that is what "no prebuilt index" means)
    Dedup.releaseCaches()
    timeBatches("inline") { i =>
      Dedup.releaseCaches()
      Dedup.minhashLshCrossPairs(corpus, batch(i), "doc_id", "text", 3, 0.8)
    }

    Dedup.releaseCaches()
    val ci = Dedup.buildCorpusIndex(corpus, "doc_id", "text", 3)
    timeBatches("cached") { i =>
      Dedup.minhashLshCrossPairsIndexed(ci, batch(i), "doc_id", "text", 0.8)
    }

    Dedup.releaseCaches()
    Dedup.persistCorpusIndex(Dedup.buildCorpusIndex(corpus, "doc_id", "text", 3),
      "graft_incrtime", buckets = 32)
    Dedup.releaseCaches()
    val disk = Dedup.loadCorpusIndex(spark, "graft_incrtime")
    timeBatches("bucketed") { i =>
      Dedup.minhashLshCrossPairsIndexed(disk, batch(i), "doc_id", "text", 0.8)
    }
    Seq("index", "sizes", "banded", "meta").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS graft_incrtime_$s"))
    spark.stop()
  }
}
