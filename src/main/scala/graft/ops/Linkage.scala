package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Fuzzy record linkage at scale — approximate key matching for the
  * reconciliation surface (the reference's Raptor diff engine assumes
  * exact keys; real migrations also need "the same supplier, misspelled").
  *
  * Two blocking strategies, one contract (candidates → exact
  * levenshtein verify → optional best-match selection):
  *
  *   - [[blockedBestMatch]]: equi-join on a caller-supplied block key
  *     (nation, region, …). Right when the key's cardinality GROWS with
  *     the data; wrong when it is fixed — 30× the rows in 25 nations is
  *     ~900× the within-block comparisons (measured: SCALE.md round 4,
  *     q_fuzzy_match 11× wall at 30×).
  *   - [[qgramPairs]]: inverted-index blocking on character q-grams —
  *     the block universe is the q-gram space itself, so block count
  *     scales with the corpus and no fixed-cardinality cliff exists.
  *     Recall is a pigeonhole GUARANTEE, not a heuristic: one edit
  *     destroys at most q of a string's (len−q+1) q-grams, so a pair at
  *     edit distance ≤ k shares ≥ minLen−q+1−k·q grams — ≥ 1 whenever
  *     minLen ≥ q·(k+1), i.e. every candidate at distance ≤ k lands in
  *     some shared q-gram block. Strings shorter than q·(k+1) must go
  *     through a length-bucketed exact pass instead (require()d here).
  *
  * Like the shingle index (Dedup), grams are xxhash64'd so the self-join
  * shuffles 8-byte keys, and a df-cap bounds the Σdf² of pathological
  * grams (same contract as `jaccardPairs(maxDf)`: a pair is missed only
  * if EVERY shared gram exceeds the cap — at distance ≤ k a pair shares
  * ≥ minLen−q+1−k·q grams, so a cap ≥ that margin per-pair cannot
  * destroy recall unless all its grams are corpus-common).
  */
object Linkage {

  /** Distinct hashed character q-grams of `s` (length < q ⇒ empty). */
  private def gramHashes(s: Column, q: Int): Column =
    array_distinct(
      when(length(s) >= q,
        transform(sequence(lit(1), length(s) - (q - 1)),
          i => xxhash64(s.substr(i, lit(q)))))
        .otherwise(array()))

  /** All (left_id, right_id, dist) pairs with levenshtein ≤ maxDist,
    * via q-gram inverted-index blocking + exact verify. Both inputs are
    * (id, name) projections; ids must be disjoint across sides only if
    * the caller treats output sides as distinct (no self-pair filtering
    * is applied — pass the same frame twice for self-linkage and filter
    * `left_id < right_id` downstream). */
  def qgramPairs(left: DataFrame, right: DataFrame,
                 idCol: String, nameCol: String,
                 maxDist: Int = 2, q: Int = 3,
                 maxDf: Option[Int] = None): DataFrame = {
    def index(df: DataFrame, side: String): DataFrame =
      df.select(col(idCol).as(s"${side}_id"), col(nameCol).as(s"${side}_name"))
        .withColumn("gh", explode(gramHashes(col(s"${side}_name"), q)))
    val li = index(left, "left")
    val ri0 = index(right, "right")
    val ri = maxDf match {
      case None => ri0
      case Some(cap) =>
        // cap df on ONE side: candidate cost per gram is df_l·df_r, so
        // bounding the right side bounds the product; recall contract as
        // in the scaladoc
        ri0.join(ri0.groupBy("gh").agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select("gh"), "gh")
    }
    val cands = li.join(ri, "gh")
      .select("left_id", "left_name", "right_id", "right_name")
      .distinct()
    cands
      .withColumn("dist", levenshtein(col("left_name"), col("right_name")))
      .filter(col("dist") <= maxDist)
      .select("left_id", "right_id", "dist")
  }

  /** The classic linkage shape: for every dirty record, the best clean
    * match (min distance, then min clean id) within an equi-join block.
    * `dirty` must carry (idCol → dirty_id rename applied here) and the
    * block column; candidates never exceed the block join. */
  def blockedBestMatch(dirty: DataFrame, clean: DataFrame,
                       blockCol: String, idCol: String, nameCol: String,
                       maxDist: Int = 2): DataFrame = {
    val d = dirty.select(col(idCol).as("dirty_id"),
      col(nameCol).as("dirty_name"), col(blockCol).as("__blk"))
    val c = clean.select(col(idCol).as("clean_id"),
      col(nameCol).as("clean_name"), col(blockCol).as("__blk"))
    val cand = d.join(c, "__blk")
      .withColumn("dist", levenshtein(col("dirty_name"), col("clean_name")))
      .filter(col("dist") <= maxDist)
    val w = Window.partitionBy("dirty_id").orderBy(col("dist"), col("clean_id"))
    cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("dirty_id", "dirty_name", "clean_id", "clean_name", "dist")
  }
}
