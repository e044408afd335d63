package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: the corpus-governance family at replica scale (the r8
  * x30/x100 constant-density fixtures) — timings for SCALE.md. The
  * privacy/funnel operators are single-aggregation shapes and should
  * track the input linearly; duplicationWeights inherits the jaccard
  * sweep + CC machinery and its previously-measured law.
  * Usage: runMain graft.tools.GovScaleProbe [dir]
  * Backs: SCALE.md governance-family replica rows.
  */
object GovScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/r8x100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[govscale] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2fs  ($r)")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count() // warm
    val quasi = docs.select(col("doc_id"), col("lang"), col("source"),
      expr("n_chars div 200").as("band"))
    timed("kAnonymize (k=4)") {
      graft.ops.Privacy.kAnonymize(quasi, "doc_id",
        Seq("lang", "source", "band"), 4L).filter(!col("kept")).count()
    }
    timed("lDiversity (l=3)") {
      graft.ops.Privacy.lDiversity(quasi, Seq("lang", "band"), "source", 3L)
        .filter(!col("diverse")).count()
    }
    timed("tCloseness (t=2000bp)") {
      graft.ops.Privacy.tCloseness(quasi, Seq("lang", "band"), "source", 2000L)
        .filter(!col("close")).count()
    }
    timed("filterFunnel (gopher chain)") {
      val toks = graft.ops.TextAnalysis.tokens(lower(coalesce(col("text"), lit(""))))
      val nW = size(toks).cast("long")
      graft.ops.Quality.filterFunnel(docs, Seq(
        "nonempty" -> (nW > 0L), "min_words_20" -> (nW >= 20L)), nW).count()
    }
    timed("kAnonymizeAgainst (90/10 split)") {
      val corpus = quasi.filter(col("doc_id") % 10 =!= 1)
      val batch = quasi.filter(col("doc_id") % 10 === 1)
      graft.ops.Privacy.kAnonymizeAgainst(batch,
        graft.ops.Privacy.buildQuasiIndex(corpus, Seq("lang", "source", "band")),
        "doc_id", Seq("lang", "source", "band"), 4L)
        .filter(!col("kept")).count()
    }
    timed("filterFunnelBy source (2 stages)") {
      val toks = graft.ops.TextAnalysis.tokens(lower(coalesce(col("text"), lit(""))))
      val nW = size(toks).cast("long")
      graft.ops.Quality.filterFunnelBy(docs, "source", Seq(
        "nonempty" -> (nW > 0L), "min_words_20" -> (nW >= 20L)), nW).count()
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    timed("recallAtK (brute vs LSH ANN)") {
      val q = emb.filter(col("vec_id") < 8L)
      graft.ops.Eval.recallAtK(
        graft.ops.Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5),
        graft.ops.Similarity.lshTopK(emb, q, "vec_id", "embedding", 5),
        "query_id", "nn_id").count()
    }
    timed("dupWeights+overlap (0.8 jaccard)") {
      val pairs = graft.ops.Dedup
        .jaccardPairsAdaptive(docs, "doc_id", "text", 3, 0.8)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val w = graft.ops.Dedup.duplicationWeights(docs, pairs, "doc_id")
        .filter(col("cluster_size") > 1L).count()
      val m = graft.ops.Dedup.sourceOverlapMatrix(pairs, docs, "doc_id", "source")
        .count()
      // confusion overhead itself (pair-frame joins, sweep amortized)
      val c = graft.ops.Eval.pairConfusion(pairs, pairs, "doc_i", "doc_j")
        .collect().head.getAs[Long]("tp")
      pairs.unpersist(blocking = false)
      s"dup=$w matrix=$m tp=$c"
    }
    spark.stop()
  }
}
