package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measure the index-wins crossover (VERDICT r17 item 3/4): SCALE.md
  * documents that the DSIR parquet index only breaks even (0.75–0.92×
  * vs the in-session build) at the driver fixture's 31-word documents —
  * the gram explode is cheap there — and CLAIMS the index wins when text
  * volume ≫ docs×buckets. This probe makes that a measured row: against
  * a long-document replica (graft.Replicate textRepeat, e.g. 32× tokens
  * per doc at 10× docs) it times, best-of-3 with caches dropped between
  * runs:
  *
  *   - dsir direct  — [[graft.ops.Selection.dsirWeights]] (pays the
  *     token-explode + md5 build in-query);
  *   - dsir indexed — [[graft.ops.Selection.dsirWeightsFromIndex]] over
  *     a parquet index built once OUTSIDE the timed region (build time
  *     reported separately — the amortization denominator);
  *   - lex  direct  — [[graft.ops.Retrieval.lexicalTopK]] (postings
  *     explode in-query);
  *   - lex  indexed — [[graft.ops.Retrieval.lexicalTopKFromPostings]]
  *     over a parquet postings index, same protocol.
  *
  * Backs: the SCALE.md r18 crossover table + the rewritten breakeven
  * caveat. Usage: Test/runMain graft.tools.IndexCrossoverProbe [dir]
  */
object IndexCrossoverProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/longdoc")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDocs = docs.count() // warmup + fixture size
    val nTok = docs.select(sum(size(split(col("text"), " ")))).first().getLong(0)
    println(s"[crossover] $dir: $nDocs docs, $nTok tokens (~${nTok / math.max(1, nDocs)}/doc)")

    def clear(): Unit = {
      graft.ops.Selection.releaseCaches()
      graft.ops.Retrieval.releaseCaches()
      spark.sharedState.cacheManager.clearCache()
    }
    // heavy (build-included) cells run min-of-2 — at crossover margins
    // (build is 10-100x the read) run-to-run noise is irrelevant and a
    // third multi-minute pass buys nothing; cheap read cells keep
    // min-of-3
    def time(name: String, reps: Int = 3)(f: => DataFrame): Double = {
      val ts = (1 to reps).map { _ =>
        clear()
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[crossover] $name%-14s best ${ts.min}%7.3f  runs ${ts.map(t => f"$t%.3f").mkString(" ")}")
      ts.min
    }

    val buckets = graft.pipelines.CurationQueries.DsirBuckets
    val maxDf = Long.MaxValue // long-doc fixture: keep every token (df-cap
    // is an operating point of the driver fixture, not of this law)

    // ── DSIR ──────────────────────────────────────────────────────────
    val direct = time("dsir direct", reps = 2) {
      graft.ops.Selection.dsirWeights(docs, "doc_id", "text",
        col("lang") === "en", buckets = buckets)
    }
    val idxPath = s"$dir/__dsir_index"
    clear()
    val tb0 = System.nanoTime()
    graft.ops.Selection.dsirIndexFrame(docs, "doc_id", "text",
      col("lang") === "en", buckets = buckets)
      .write.mode("overwrite").parquet(idxPath)
    val buildSec = (System.nanoTime() - tb0) / 1e9
    println(f"[crossover] dsir build      $buildSec%7.3f (one-time, amortized)")
    val indexed = time("dsir indexed") {
      graft.ops.Selection.dsirWeightsFromIndex(
        spark.read.parquet(idxPath), docs.select("doc_id"), "doc_id")
    }

    // ── lexical postings ──────────────────────────────────────────────
    val queries = docs.filter(col("doc_id") < 8)
    val lexDirect = time("lex direct", reps = 2) {
      graft.ops.Retrieval.lexicalTopK(docs, queries, "doc_id", "text",
        k = 10, maxDf = maxDf)
    }
    val postPath = s"$dir/__postings_index"
    clear()
    val tp0 = System.nanoTime()
    graft.ops.Retrieval.postingsIndex(docs, "doc_id", "text")
      .write.mode("overwrite").parquet(postPath)
    val postBuildSec = (System.nanoTime() - tp0) / 1e9
    println(f"[crossover] lex build       $postBuildSec%7.3f (one-time, amortized)")
    val nd = docs.agg(count(lit(1)).as("n_docs"))
    val lexIndexed = time("lex indexed") {
      graft.ops.Retrieval.lexicalTopKFromPostings(
        spark.read.parquet(postPath), nd, queries, "doc_id", "text",
        k = 10, maxDf = maxDf)
    }

    println(f"[crossover] SUMMARY dsir direct/indexed = ${direct / indexed}%.2fx " +
      f"(build $buildSec%.1f s amortizes in ${buildSec / math.max(1e-9, direct - indexed)}%.1f queries); " +
      f"lex direct/indexed = ${lexDirect / lexIndexed}%.2fx " +
      f"(build $postBuildSec%.1f s amortizes in ${postBuildSec / math.max(1e-9, lexDirect - lexIndexed)}%.1f queries)")
    spark.stop()
  }
}
