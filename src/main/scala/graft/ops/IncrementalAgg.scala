package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental aggregate maintenance — the materialized-view pattern for
  * append-only facts: keep a compact per-key state of MERGEABLE partial
  * aggregates (count / exact decimal sum / min / max), fold each new
  * batch in, and derive presentation metrics only at publish time.
  *
  * Scale posture: the daily cost is one shuffle over the NEW batch plus
  * a re-aggregation of (state ∪ batch-partials), both sized by key
  * cardinality — history is never rescanned. On a 100 TB fact table with
  * a bounded key space that turns an O(total) daily recompute into
  * O(day). Every state column is mergeable (sum-of-sums, min-of-mins,
  * …), so [[merge]] is associative and commutative: batches can arrive
  * in any order, and a backfill is just more merges (proven in
  * `IncrementalAggSpec`).
  *
  * The sum is DECIMAL — exact and aggregation-order-independent — so the
  * incrementally maintained state is BIT-IDENTICAL to a from-scratch
  * groupBy at every step, not merely close (the differential oracle for
  * `q_incr_agg` is the full-table aggregate itself).
  */
object IncrementalAgg {

  /** Per-row cast type: fixes the scale (4) input values are rounded to
    * before summing. */
  val SumDec: DecimalType = DecimalType(18, 4)

  /** Accumulated-state sum type — MAX precision, because the state is
    * the thing that grows without bound on an append-only fact table: a
    * (18,4) running sum caps at ~1e14 and, under Spark's default
    * non-ANSI mode, overflow SILENTLY nulls sum_v/avg_v rather than
    * failing. (38,4) holds ~1e34 — beyond any plausible fact volume —
    * and costs nothing at publish, where the value is cast once. */
  val StateDec: DecimalType = DecimalType(38, 4)

  /** Partial-aggregate state of one batch: one row per key with
    * (n_rows, sum_v, min_v, max_v). */
  def initState(batch: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col(valueCol).cast(SumDec)).cast(StateDec).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** Fold a new batch into existing state. The batch is partially
    * aggregated first (one shuffle over the batch only), then the two
    * compact state frames re-aggregate by key — history is untouched. */
  def merge(state: DataFrame, batch: DataFrame, keys: Seq[String],
            valueCol: String): DataFrame =
    mergeStates(state, initState(batch, keys, valueCol), keys)

  /** Merge two partial-aggregate states (both already keyed). */
  def mergeStates(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("sum_v")).cast(StateDec).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** Presentation projection over the state: derived metrics computed
    * from exact partials (avg via exact-decimal → double division, so
    * the value is a pure function of the state, not of batch order). */
  def publish(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(
      keys.map(col) ++ Seq(
        col("n_rows"), col("sum_v"), col("min_v"), col("max_v"),
        (col("sum_v").cast("double") / col("n_rows").cast("double"))
          .as("avg_v")): _*)
}
