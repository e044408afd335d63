package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism recovery for work-amplifying stages (optimization guide
  * §2.5 "input skew" / §6 "input split size").
  *
  * Input splits are sized by scan BYTES (`spark.sql.files.maxPartitionBytes`),
  * so a stage that amplifies each input row into many derived rows — a
  * shingle/n-gram explode, a per-character md5 scan, a ×B bootstrap
  * replication — inherits parallelism that is orders of magnitude too
  * coarse when the source is a handful of small files: one consolidated
  * parquet file scans as ONE split and the whole CPU-bound pass
  * serializes onto a single core. [[Dedup.passageWins]] measured the
  * canonical instance (4.6 s → 1.4 s at sf0.1 from the repartition
  * alone); this helper is that fix, factored out and made CONDITIONAL so
  * a well-split corpus never pays a byte:
  *
  *   - target parallelism = `spark.sql.shuffle.partitions` (the bench
  *     contract parameterizes it as SPARK_GRAFT_CPUS; a cluster sets it
  *     to cluster parallelism — never a local constant);
  *   - the exchange is inserted ONLY when the planned layout is below
  *     target, so a 100 TB scan with thousands of splits is a no-op
  *     (zero added shuffle) while a single-split local scan fans out;
  *   - hash-partitioned on caller-named key columns: deterministic under
  *     retry (guide §2.5 warns off rand-derived keys), balanced for
  *     unique ids, and cheaper than round-robin's sort-before-repartition.
  *
  * Results are bit-identical by construction — partitioning is invisible
  * to the exact (count/sum128/integer-bits) aggregations every consumer
  * of a widened frame performs.
  */
private[graft] object Par {

  /** `df` repartitioned to the session's shuffle parallelism on `keys`,
    * iff it is a NARROW (scan-lineage) frame whose planned layout has
    * fewer partitions — identity otherwise.
    *
    * The narrow check is load-bearing twice over: (1) a frame whose
    * lineage already contains a shuffle-inducing operator is laid out at
    * shuffle parallelism, so widening it buys nothing; (2) under AQE,
    * `.rdd` on such a frame MATERIALIZES every upstream query stage at
    * call time (AdaptiveSparkPlanExec resolves its final plan by running
    * the intermediate exchanges as jobs) — probed r18: widening an
    * anti-join input ran the whole upstream pipeline eagerly and the
    * consuming query re-ran it. On a narrow plan `.rdd` is plan-only
    * (file listing, no job) — the passageWins precedent.
    *
    * Scans are allowlisted in BOTH planner surfaces (the V1
    * `LogicalRelation` today's parquet reads resolve to, and
    * `DataSourceV2Relation`/`Range` so a source migrating to DSv2 keeps
    * its widen instead of silently degrading to identity — ADVICE r18).
    * The bit-identity claim holds only for DETERMINISTIC plans: a narrow
    * Project computing e.g. `monotonically_increasing_id()` or `rand()`
    * would change values under the inserted exchange, so any
    * non-deterministic expression anywhere in the plan forces identity
    * rather than relying on a caller precondition (ADVICE r18). */
  def widen(df: DataFrame, keys: Column*): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    var narrow = true
    df.queryExecution.analyzed.foreach {
      case p @ (_: Filter | _: Project | _: SubqueryAlias
         | _: org.apache.spark.sql.execution.datasources.LogicalRelation
         | _: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
         | _: Range | _: View | _: LocalRelation) =>
        if (p.expressions.exists(!_.deterministic)) narrow = false
      case _ => narrow = false
    }
    if (!narrow) df
    else {
      val target = df.sparkSession.conf
        .get("spark.sql.shuffle.partitions", "32").toInt
      if (df.rdd.getNumPartitions >= target) df
      else if (keys.nonEmpty) df.repartition(target, keys: _*)
      else df.repartition(target)
    }
  }
}
