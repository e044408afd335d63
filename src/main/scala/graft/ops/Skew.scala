package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation for hot join keys — the manual salting pattern for
  * when AQE's skew-join split isn't available or isn't enough (e.g. a
  * single key holding >50% of a 100 TB fact table).
  *
  * WHEN AQE ALREADY HANDLES IT (measured, SkewSpec "AQE splits a skewed
  * bare join..."): a skewed sort-merge/shuffled-hash join whose output
  * feeds no operator that needs the join's hash partitioning in the SAME
  * stage — AQE's `OptimizeSkewedJoin` splits the oversized partition and
  * replicates the matching side, and manual salting is pure overhead.
  * WHEN IT CANNOT: (a) the join feeds a same-stage aggregation/window on
  * the join key — splitting the partition would break the downstream
  * distribution requirement, so AQE leaves it whole (asserted in the same
  * spec: no `skew=true` flag appears); (b) the skew is in an AGGREGATION
  * key, not a join — partial aggregation absorbs algebraic aggs
  * map-side, but non-algebraic state (collect_list, exact distinct per
  * key) still funnels; (c) broadcast joins — no shuffle to split, and no
  * skew problem either. For (a)/(b) this module (or a two-phase salted
  * aggregation) is the fix. SCALE.md "Round 6" has the decision table.
  *
  * `saltedJoin(big, small, keys, n)` is semantically IDENTICAL to
  * `big.join(small, keys, "inner")` (proven against the DuckDB oracle in
  * `q_join_salted`): the big side gets a deterministic salt in [0, n),
  * the small side is exploded n× so every (key, salt) pair exists, and
  * the join key becomes (keys..., salt) — one hot key now spreads over n
  * shuffle partitions instead of one.
  *
  * The salt must NOT depend on the join key alone (all rows of the hot
  * key would land in one salt again); it hashes the whole row. Rows that
  * are fully identical share a salt — that residual skew is bounded by
  * the duplicate count, which a dedup gate upstream bounds at 1.
  */
object Skew {

  /** Deterministic per-row salt in [0, n): xxhash64 of every column. */
  def rowSalt(df: DataFrame, n: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(n.toLong)).cast("int")

  /** Inner equi-join with the big side salted and the small side
    * replicated n×. Column set of the result matches the plain join
    * (join keys first, then both sides' payloads). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 n: Int = 8): DataFrame = {
    require(n > 0, "salt fan-out must be positive")
    val salted = big.withColumn("_salt", rowSalt(big, n))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(n - 1)).cast("array<int>")))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }
}
