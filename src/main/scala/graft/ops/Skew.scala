package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation for hot join keys — the manual salting pattern for
  * when AQE's skew-join split isn't available or isn't enough (e.g. a
  * single key holding >50% of a 100 TB fact table).
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
