package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval contamination detection — the decontamination sweep every
  * serious training corpus runs before a model sees it: find training
  * documents whose word n-grams cover a large fraction of some eval
  * document's n-grams.
  *
  * The score is *containment* — |S(eval) ∩ S(train)| / |S(eval)| — not
  * symmetric Jaccard: a short eval prompt fully quoted inside a long
  * training page is 100% contaminated even though the pair's Jaccard is
  * tiny. (Same shape as the n-gram-overlap decontamination described in
  * the GPT-3/PaLM appendices — public methodology.)
  *
  * Scale posture: a *bipartite* inverted shingle-hash index join — never
  * an |eval| × |train| cross join. Cost is Σ_shingle df_eval · df_train,
  * and the eval side is tiny relative to the corpus (benchmarks, not the
  * 100 TB crawl), so candidate generation is bounded by the eval side's
  * index. `maxDf` applies the same df-capping as [[Dedup.jaccardPairs]]
  * when a degenerate shingle is shared by everything: shingles with
  * train-df above the cap are dropped from CANDIDATE GENERATION only,
  * and every candidate's containment is then computed exactly over the
  * full indexes — a pair is missed only if ALL its shared shingles
  * exceed the cap.
  */
object Contamination {

  // both sides pay a per-character shingle-hash pass — widen a
  // single-split scan to session parallelism first (Par.widen: no-op on
  // a well-split corpus; the passageWins parallelism fix)
  private def index(docs: DataFrame, side: String, idCol: String,
                    textCol: String, n: Int) = Par.widen(docs, col(idCol)).select(
    col(idCol).as(s"${side}_id"),
    explode(graft.functions.ShingleHashes.shingleHashes(col(textCol), n))
      .as("shash"))

  private def sizes(eval: DataFrame, idCol: String, textCol: String, n: Int) =
    Par.widen(eval, col(idCol)).select(col(idCol).as("eval_id"),
      size(graft.functions.ShingleHashes.shingleHashes(col(textCol), n))
        .as("n_eval"))

  private def score(common: DataFrame, evalSizes: DataFrame,
                    threshold: Double) =
    common.join(evalSizes, "eval_id")
      .withColumn("containment", col("common") * lit(1.0) / col("n_eval"))
      .filter(col("containment") >= threshold)
      .select("eval_id", "train_id", "containment")

  /** (eval_id, train_id, containment) for every cross pair with
    * containment ≥ threshold. Shingle hashing/distinctness matches
    * [[Dedup.jaccardPairs]] (xxhash64'd word n-grams — 8-byte shuffle
    * keys). Eval docs with fewer than `n` tokens have no shingles and
    * produce no pairs. `maxDf = None` (default) is fully exact. */
  def containmentPairs(train: DataFrame, eval: DataFrame, idCol: String,
                       textCol: String, n: Int = 3,
                       threshold: Double = 0.5,
                       maxDf: Option[Int] = None): DataFrame = {
    val evalIdx = index(eval, "eval", idCol, textCol, n)
    val trainIdx = index(train, "train", idCol, textCol, n)
    val evalSizes = sizes(eval, idCol, textCol, n)
    val common = maxDf match {
      case None =>
        evalIdx.join(trainIdx, "shash")
          .groupBy("eval_id", "train_id").agg(count(lit(1)).as("common"))
      case Some(cap) =>
        // candidates only from rare (train-df ≤ cap) shingles, then the
        // TRUE common count over the full indexes for those candidates
        val rare = trainIdx.groupBy("shash").agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select("shash")
        val cands = evalIdx.join(trainIdx.join(rare, "shash"), "shash")
          .select("eval_id", "train_id").distinct()
        cands.as("c")
          .join(evalIdx.as("e"), col("c.eval_id") === col("e.eval_id"))
          .join(trainIdx.as("t"),
            col("c.train_id") === col("t.train_id") &&
              col("e.shash") === col("t.shash"))
          .groupBy(col("c.eval_id").as("eval_id"),
            col("c.train_id").as("train_id"))
          .agg(count(lit(1)).as("common"))
    }
    score(common, evalSizes, threshold)
  }

  /** [[containmentPairs]] with the train-side index BLOOM-REDUCED at the
    * scan — the decontamination shape that actually fits a 100 TB corpus.
    *
    * The exact form shuffles EVERY training shingle into the bipartite
    * join even though almost none match (eval sets are benchmarks — a few
    * million shingles against trillions). Here a Bloom filter of the eval
    * side's distinct shingle hashes (built by [[BloomJoin.buildFilter]],
    * sized honestly by one small count job over the eval side) rides into
    * the train-side scan via [[graft.functions.BloomMightContain]]:
    * definite non-members — the overwhelming majority — drop BEFORE the
    * exchange, so train-side shuffle volume falls from |corpus shingles|
    * to |true matches| + fpp·|corpus shingles|.
    *
    * The result row-for-row EQUALS `containmentPairs(maxDf = None)`: a
    * Bloom filter has no false negatives, and a false positive's shingle
    * hash does not exist on the eval side of the equi-join, so every FP
    * dies in the exact join it was admitted to — fpp tunes shuffle
    * volume, never output. (`ContaminationSpec` asserts the equivalence
    * at fpp = 0.5, where false positives are guaranteed.)
    *
    * Sizing: pass `expectedShingles` when the eval suite's shingle count
    * is known (it usually is — benchmarks are fixed artifacts) and the
    * build is a single treeAggregate job. Left at None, one
    * approx_count_distinct job (±2%, padded 1.25×) sizes it — the filter
    * is built over the RAW eval index either way, since duplicate inserts
    * are idempotent and a distinct() here would cost the very shuffle the
    * sketch exists to avoid. Undersizing degrades fpp, never rows.
    * Callers gating many batches against ONE eval suite (the streaming
    * ingestion gate) prebuild the sketch once with [[evalFilterBytes]]
    * and pass it as `filterBytes` — no per-call build jobs at all. */
  def containmentPairsBloom(train: DataFrame, eval: DataFrame, idCol: String,
                            textCol: String, n: Int = 3,
                            threshold: Double = 0.5,
                            fpp: Double = 0.01,
                            expectedShingles: Option[Long] = None,
                            filterBytes: Option[Array[Byte]] = None): DataFrame = {
    val evalIdx = index(eval, "eval", idCol, textCol, n)
    val bytes = filterBytes.getOrElse {
      val expected = math.max(expectedShingles.getOrElse(
        (evalIdx.agg(approx_count_distinct(col("shash")).as("d"))
          .head.getLong(0) * 1.25).toLong), 1L)
      BloomJoin.buildFilter(evalIdx.select("shash"), "shash", expected, fpp)
    }
    val trainIdx = index(train, "train", idCol, textCol, n)
      .filter(graft.functions.BloomMightContain.mightContain(col("shash"), bytes))
    val common = evalIdx.join(trainIdx, "shash")
      .groupBy("eval_id", "train_id").agg(count(lit(1)).as("common"))
    score(common, sizes(eval, idCol, textCol, n), threshold)
  }

  /** [[containmentPairsBloom]] with the sketch engaged ADAPTIVELY — the
    * same insurance discipline as [[Dedup.jaccardPairsAdaptive]]: pay a
    * cheap probe, buy the reduction machinery only where it pays.
    *
    * The Bloom build costs two extra walks of the eval side (the sizing
    * `approx_count_distinct` and the `treeAggregate` build), each
    * re-shingling eval text. That amortizes only on the fixed-eval
    * geometry the sketch exists for — a small benchmark suite against a
    * corpus orders of magnitude larger (SCALE.md: 2× win at x30/x100
    * fixed-eval, a measured LOSS at the balanced sf0.1 split). The probe
    * compares ROW counts (`df.count()` — parquet-metadata cheap, never a
    * text scan; document-count ratio is the right proxy because both
    * sides shingle the same way) and engages the sketch only when the
    * train side outnumbers eval by ≥ `engageFactor`. A caller holding a
    * prebuilt `filterBytes` skips the probe entirely — the sketch is
    * free, so it always rides.
    *
    * EAGER (two count jobs at call time) — a data-dependent plan choice,
    * like every adaptive form here. Either branch returns row-identical
    * results ([[containmentPairsBloom]]'s no-false-negatives argument),
    * so the choice is invisible to correctness. */
  def containmentPairsBloomAdaptive(train: DataFrame, eval: DataFrame,
                                    idCol: String, textCol: String,
                                    n: Int = 3, threshold: Double = 0.5,
                                    fpp: Double = 0.01,
                                    engageFactor: Double = 24.0,
                                    expectedShingles: Option[Long] = None,
                                    filterBytes: Option[Array[Byte]] = None): DataFrame =
    if (filterBytes.isDefined ||
        train.count() >= engageFactor * math.max(eval.count(), 1L))
      containmentPairsBloom(train, eval, idCol, textCol, n, threshold, fpp,
        expectedShingles, filterBytes)
    else
      containmentPairs(train, eval, idCol, textCol, n, threshold)

  /** Serialized Bloom sketch of `eval`'s shingle hashes, for reuse across
    * many [[containmentPairsBloom]] calls against one fixed eval suite
    * (the streaming gate's shape: build once at stream start, probe every
    * micro-batch). Sizing as in [[containmentPairsBloom]]. */
  def evalFilterBytes(eval: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, fpp: Double = 0.01,
                      expectedShingles: Option[Long] = None): Array[Byte] = {
    val evalIdx = index(eval, "eval", idCol, textCol, n)
    val expected = math.max(expectedShingles.getOrElse(
      (evalIdx.agg(approx_count_distinct(col("shash")).as("d"))
        .head.getLong(0) * 1.25).toLong), 1L)
    BloomJoin.buildFilter(evalIdx.select("shash"), "shash", expected, fpp)
  }

  /** Per-eval-document verdict: the worst (max-containment) offending
    * train doc, ties broken by min train id; eval docs with no pair over
    * the threshold report containment 0.0 and a NULL offender — so the
    * output is a complete audit table over the eval set, one row each. */
  def evalSummary(eval: DataFrame, pairs: DataFrame, idCol: String): DataFrame = {
    // rank-based worst-offender pick: orders by (containment desc, id asc)
    // without negating the id, so string doc ids (the common corpus case)
    // work as well as numeric ones. The window partitions by eval_id —
    // per-group, never global, and bounded by that doc's candidate count.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("eval_id")
      .orderBy(col("containment").desc, col("train_id").asc)
    val worst = pairs
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("eval_id"), col("containment").as("max_containment"),
        col("train_id").as("worst_train_id"))
    eval.select(col(idCol).as("eval_id"))
      .join(worst, Seq("eval_id"), "left")
      .select(col("eval_id"),
        coalesce(col("max_containment"), lit(0.0)).as("max_containment"),
        col("worst_train_id"),
        col("max_containment").isNotNull.as("contaminated"))
  }
}
