package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Pre-flight join cardinality audit — the question to ask BEFORE
  * running a 100 TB join: how many rows will it produce, and is one hot
  * key about to make a single task carry half of them? Computed from
  * the two sides' per-key counts: predicted output = Σ_k cl(k)·cr(k),
  * and the largest per-key product is the worst single-key fanout a
  * shuffle-hash join concentrates in one task (the number that decides
  * between a plain join, [[Skew]] salting, or a broadcast).
  *
  * Shape: one map-side-combined `groupBy(keys).count` per side (the
  * count frames are key-cardinality, not row-cardinality), an inner
  * join of the two count frames, one global aggregate. Products and
  * sums ride DECIMAL(38): each per-key product is exact up to
  * 10¹⁸×10¹⁸ (where a long would silently wrap), and the TOTAL stays
  * exact while Σ products < 10³⁸. Past that, Spark's non-ANSI decimal
  * aggregation returns NULL rather than a wrong number — a NULL
  * `predicted_rows` therefore READS as "join too large to count in 38
  * digits", which is itself the audit's loudest possible warning.
  */
object JoinAudit {

  private val Dec = DecimalType(38, 0)

  /** Per-key fanout frame: (keys..., left_n, right_n, pair_n) for keys
    * present on BOTH sides (inner-join semantics; NULL keys excluded as
    * in equi-joins). */
  def keyFanout(left: DataFrame, right: DataFrame,
                keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one join key")
    def counts(df: DataFrame, out: String) = df
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as(out))
    counts(left, "left_n").join(counts(right, "right_n"), keys)
      .withColumn("pair_n",
        (col("left_n").cast(Dec) * col("right_n").cast(Dec)).cast(Dec))
  }

  /** One-row audit summary: (matched_keys, predicted_rows,
    * max_key_fanout, skew_ratio) where skew_ratio = max_key_fanout /
    * (predicted_rows / matched_keys) — how many "average keys" the
    * hottest key weighs. predicted_rows/max as DECIMAL(38) exact;
    * skew_ratio one double division. */
  def joinFanout(left: DataFrame, right: DataFrame,
                 keys: Seq[String]): DataFrame =
    keyFanout(left, right, keys)
      .agg(count(lit(1)).as("matched_keys"),
        sum("pair_n").cast(Dec).as("predicted_rows"),
        max("pair_n").cast(Dec).as("max_key_fanout"))
      .withColumn("skew_ratio",
        col("max_key_fanout").cast("double") /
          (col("predicted_rows").cast("double") /
            col("matched_keys").cast("double")))
}
