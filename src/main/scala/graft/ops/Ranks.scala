package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — the scalable form of
  * `percent_rank() OVER (ORDER BY v)` (no partition clause), which Spark
  * plans as a SINGLE-partition window: every row funnels through one task,
  * the classic 100 TB scale-killer (SURVEY.md §4 anti-pattern 3, mandated
  * by the reference's customer mart
  * `m_customer_sales_report_task.py:106-122`).
  *
  * The key observation: RANK (and therefore percent_rank = (rank-1)/(n-1))
  * depends only on the row's VALUE — every tie shares the rank of the
  * first row of its run. So rank the DISTINCT values instead of the rows,
  * entirely IN-PLAN (building this DataFrame runs zero Spark jobs — it is
  * a free plan transform like any other operator; everything below
  * executes lazily at action time):
  *
  *   1. `groupBy(value).count()` — one map-side-combined shuffle; output
  *      is (value, cnt), two columns regardless of input width.
  *   2. `repartitionByRange(value).sortWithinPartitions` — a range
  *      shuffle of the compact frame; equal values collapse into one row
  *      in step 1, so a run of ties can never straddle a partition
  *      boundary (the failure mode of naive rank-with-offset schemes).
  *      The EXPLICIT partition count makes this a REPARTITION_BY_NUM
  *      shuffle, which AQE never coalesces. The bucketed frame is
  *      PERSISTED because `spark_partition_id()` over a range exchange
  *      is only branch-consistent if the exchange is materialized once:
  *      each physical Exchange instance SAMPLES its own range boundaries
  *      (from nondeterministically-ordered shuffle reads), so the two
  *      consumers below (totals and the running-sum window), if planned
  *      as separate exchanges, can bucket the same value differently and
  *      corrupt every rank near a boundary — observed as mart tier flips
  *      clustered exactly at the 0.2/0.5 percent_rank cut lines. The
  *      persist pins ONE subtree instance (one sampled partitioner) for
  *      both branches; exchange reuse alone is an optimization, not a
  *      guarantee.
  *   3. Per-bucket totals collapse into ONE row carrying the sorted
  *      (pid, tot) array — a global aggregate, so its single-partition
  *      exchange moves at most `parts` compact rows (a bounded protocol,
  *      not row data; `PlanGate` distinguishes exactly this shape).
  *      Broadcast-cross-joining that row back gives every bucket its
  *      offset (array-HOF prefix sum over pids strictly before) and the
  *      global n — no driver action, no collected offsets.
  *   4. rank(v) = bucket offset + within-bucket running sum of counts
  *      strictly before v (a window PARTITIONED by bucket — distributed).
  *   5. Equi-join (null-safe) the (value, percent_rank) frame back.
  *
  * Shuffled volume is a few × |distinct values| compact rows plus the
  * join — never a single-partition exchange over row data. The computed
  * value is BIT-IDENTICAL to Spark's `percent_rank` window: same rank
  * definition, same `(rank-1)/(n-1)` double division (0.0 when n ≤ 1),
  * same null ordering (nulls last under DESC, first under ASC — Spark's
  * window defaults).
  *
  * The input is scanned twice (once feeding the count shuffle, once as
  * the join probe) — callers ranking an expensive lineage should persist
  * it first, exactly like any multi-consumer diamond. Unlike the previous
  * eager-offset formulation there is no construction-time snapshot: both
  * sides evaluate at action time, so a retry loop or lazily-assembled DAG
  * can hold this frame for free.
  */
object Ranks {

  /** Recently-persisted bucketed rank frames, bounded and session-keyed
    * ([[CacheWindows]]: oldest unpersisted on overflow — worst case a
    * recompute, never a wrong result WITHIN one action, since an
    * in-flight action holds its own reference to the frame). */
  private[graft] val cacheWindow = new CacheWindows(4)

  private def cached(df: DataFrame): DataFrame = cacheWindow.add(df)

  /** Drop every frame this module still has persisted (all sessions). */
  def releaseCaches(): Unit = cacheWindow.releaseAll()

  /** Drop only the frames registered by `spark`'s window. */
  def releaseCaches(spark: org.apache.spark.sql.SparkSession): Unit =
    cacheWindow.release(spark)

  /** Append `outCol` = global percent_rank of `valueCol` (descending by
    * default, matching "top fraction" tiering semantics). */
  def globalPercentRank(df: DataFrame, valueCol: String,
                        descending: Boolean = true,
                        outCol: String = "percent_rank"): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val compact = df.groupBy(col(valueCol).as("__rank_v"))
      .agg(count(lit(1)).as("__rank_cnt"))
    val sortKey = if (descending) col("__rank_v").desc else col("__rank_v").asc
    // persisted: ONE materialization of the range exchange, so both
    // consumers below see the same sampled boundaries (scaladoc step 2)
    val bucketed = cached(compact.repartitionByRange(parts, sortKey)
      .sortWithinPartitions(sortKey)
      .withColumn("__rank_pid", spark_partition_id()))

    // one row: the sorted (pid, tot) array — ≤ `parts` structs
    val totals = bucketed.groupBy("__rank_pid")
      .agg(sum("__rank_cnt").as("__rank_tot"))
      .agg(sort_array(collect_list(struct(
        col("__rank_pid").as("pid"), col("__rank_tot").as("tot")))).as("__rank_arr"))

    // counts strictly before the current value within its bucket
    val w = Window.partitionBy("__rank_pid").orderBy(sortKey)
      .rowsBetween(Window.unboundedPreceding, -1)

    val ranks = bucketed
      .withColumn("__rank_in", coalesce(sum("__rank_cnt").over(w), lit(0L)))
      .crossJoin(broadcast(totals))
      .withColumn("__rank_off", aggregate(
        filter(col("__rank_arr"), x => x("pid") < col("__rank_pid")),
        lit(0L), (acc, x) => acc + x("tot")))
      .withColumn("__rank_n", aggregate(
        col("__rank_arr"), lit(0L), (acc, x) => acc + x("tot")))
      .withColumn(outCol,
        when(col("__rank_n") <= 1L, lit(0.0)).otherwise(
          (col("__rank_off") + col("__rank_in")).cast("double") /
            (col("__rank_n") - 1L).cast("double")))
      .select(col("__rank_v"), col(outCol))
    df.join(ranks, col(valueCol) <=> col("__rank_v"), "left").drop("__rank_v")
  }
}
