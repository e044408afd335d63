package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact frequent-token extraction at corpus scale — the "which tokens
  * exceed 1/k of the stream" primitive behind vocabulary pruning and
  * boilerplate detection, without materializing the full term frequency
  * table.
  *
  * Why not a plain `GROUP BY token`: at 100 TB the token domain is the
  * web vocabulary (billions of keys) and the full-frequency shuffle is
  * the cost. The classic answer is the two-pass Misra–Gries protocol:
  *
  *   1. each partition streams its tokens through a (k-1)-counter
  *      Misra–Gries summary (bounded memory, no shuffle);
  *      the per-partition summaries (≤ (k-1) counters each) ship to the
  *      driver — P·(k-1) counters, never rows, same driver protocol
  *      shape as [[Quantiles]]' histograms;
  *   2. the driver merges summaries (sum counts, then the standard MG
  *      reduction: subtract the k-th largest and drop non-positives),
  *      which preserves the guarantee: ANY token with true count
  *      > n/k SURVIVES the merged summary (error ≤ n/k ⇒ its residual
  *      count stays positive). Survivors ≤ k-1 — a candidate superset
  *      with no false negatives;
  *   3. a second scan counts ONLY the candidates exactly (broadcast
  *      isin filter → tiny groupBy) and keeps those with
  *      exact count · k > n.
  *
  * False positives are culled by the exact rescan and false negatives
  * are impossible, so the output is EXACT and deterministic (merge/
  * partition order can change the candidate superset, never the
  * answer) — which is what makes a SQL oracle (`HAVING cnt·k > n`)
  * possible for a sketch-based operator. Tokenization matches
  * [[TextAnalysis.tokens]] (space-split, empties dropped).
  */
object HeavyHitters {

  /** (token, cnt) for every token with exact count · k > total tokens,
    * exact counts. `k` bounds pass-1 memory at k-1 counters per
    * partition and caps the candidate set at k-1. */
  def frequentTokens(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
    // pass 1: per-partition (total, MG summary)
    val partials: Array[(Long, Map[String, Long])] = toks.as[String]
      .mapPartitions { it => Iterator(mgSummarize(it, k)) }
      .collect()
    val n = partials.iterator.map(_._1).sum
    val candidates = mgMerge(partials.iterator.map(_._2), k).keys.toSeq
    if (n == 0 || candidates.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        toks.groupBy("token").agg(count(lit(1)).as("cnt")).schema)
    // pass 2: exact counts of the bounded candidate set only
    toks.filter(col("token").isin(candidates: _*))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(k.toLong) > lit(n)) // integer math, no float
  }

  /** One Misra–Gries pass over a token iterator: ≤ k-1 counters.
    * Decrement-all is amortized O(1) per token (every decrement cancels
    * one prior increment). */
  private[graft] def mgSummarize(it: Iterator[String], k: Int): (Long, Map[String, Long]) = {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    var total = 0L
    it.foreach { t =>
      total += 1
      counters.get(t) match {
        case Some(c) => counters(t) = c + 1
        case None if counters.size < k - 1 => counters(t) = 1L
        case None =>
          for (key <- counters.keys.toArray) {
            val c = counters(key) - 1
            if (c == 0L) counters.remove(key) else counters(key) = c
          }
      }
    }
    (total, counters.toMap)
  }

  /** Standard MG summary merge: sum counts, then if over capacity
    * subtract the k-th largest residual and drop non-positives — the
    * merged summary keeps the global ≤ n/k error bound. */
  private[graft] def mgMerge(summaries: Iterator[Map[String, Long]],
                             k: Int): Map[String, Long] = {
    val acc = scala.collection.mutable.HashMap.empty[String, Long]
    summaries.foreach(_.foreach { case (t, c) =>
      acc(t) = acc.getOrElse(t, 0L) + c
    })
    if (acc.size <= k - 1) acc.toMap
    else {
      val kth = acc.values.toArray.sorted(Ordering[Long].reverse).apply(k - 1)
      acc.iterator.map { case (t, c) => t -> (c - kth) }
        .filter(_._2 > 0L).toMap
    }
  }
}
