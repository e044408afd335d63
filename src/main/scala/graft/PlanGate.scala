package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.{EnsureRequirements, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Static plan-quality gate over the physical plan of a query.
  *
  * Encodes the scale anti-patterns a reviewer would hand-flag — the point
  * is that `PlanGateSpec` runs this over EVERY `SparkEntry.queries` entry,
  * so a plan regression (a new single-partition window, a join that
  * degenerates to a nested loop, a filter that stops reaching the scan)
  * fails CI instead of waiting for a human plan audit.
  *
  * Violations reported:
  *  - `single-partition:<child>` — an `Exchange SinglePartition` whose
  *    child is NOT a compact producer (global-agg partial or LocalLimit).
  *    Those two are the legitimate one-row/k-row protocols; anything else
  *    funnels row data through one task — the straggler/OOM shape at
  *    100 TB.
  *  - `cartesian-product` / `broadcast-nested-loop` — non-equi join
  *    fallbacks; quadratic unless one side is provably tiny. A BNLJ whose
  *    broadcast side is a compact producer (global-agg partial, e.g. the
  *    one-row `crossJoin(broadcast(nDocs))` protocol, or a LocalLimit) is
  *    NOT flagged — that is the intended plan for scalar fan-out.
  *  - `unpushed-scan-filter:<table>` — a Filter sits directly on a parquet
  *    scan but NOTHING was pushed into the scan (`dataFilters` empty): the
  *    predicate shape blocked pushdown entirely, so the scan reads and
  *    materializes every row group before filtering.
  */
object PlanGate {

  /** The pre-AQE physical plan — the static shape the planner committed
    * to; AQE can only improve on it at runtime (BHJ conversion, coalesce).
    *
    * `AdaptiveSparkPlanExec.inputPlan` predates the stage-preparation
    * rules, so the distribution-mandated exchanges (including every
    * `Exchange SinglePartition` this gate exists to catch) are NOT in it
    * yet — re-apply [[EnsureRequirements]] to see the shape that will
    * actually execute. Without this the gate silently inspected a plan
    * with no requirement-inserted shuffles at all. */
  def staticPlan(df: DataFrame): SparkPlan = df.queryExecution.executedPlan match {
    case a: AdaptiveSparkPlanExec => EnsureRequirements()(a.inputPlan)
    case p => p
  }

  @annotation.tailrec
  private def strip(p: SparkPlan): SparkPlan = p match {
    case w: WholeStageCodegenExec => strip(w.child)
    case i: InputAdapter => strip(i.child)
    case c: ColumnarToRowExec => strip(c.child)
    case pr: ProjectExec => strip(pr.child)
    case _ => p
  }

  private def isCompactProducer(p: SparkPlan): Boolean = strip(p) match {
    case h: HashAggregateExec => h.groupingExpressions.isEmpty
    case o: ObjectHashAggregateExec => o.groupingExpressions.isEmpty
    case s: SortAggregateExec => s.groupingExpressions.isEmpty
    case l: LocalLimitExec => l.limit >= 0
    case _ => false
  }

  def violations(plan: SparkPlan): Seq[String] = {
    // Unwrap AQE first: under AQE an InMemoryRelation's cachedPlan is an
    // AdaptiveSparkPlanExec, which is a LEAF for collect/transform — the
    // real plan hangs off inputPlan, and without this unwrap everything
    // cached behind a persist() (ResultSort, operator cache windows)
    // would silently escape the gate.
    val p = plan match {
      case a: AdaptiveSparkPlanExec => EnsureRequirements()(a.inputPlan)
      case other => other
    }
    // recurse into cached subtrees — InMemoryRelation.cachedPlan is not a
    // child of the consumer plan, so a funnel hidden behind a persist()
    // would otherwise escape the gate
    val cachedViolations = p.collect {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        violations(s.relation.cachedPlan)
    }.flatten
    direct(p) ++ cachedViolations
  }

  private def direct(plan: SparkPlan): Seq[String] = plan.collect {
    case e: ShuffleExchangeExec
        if e.outputPartitioning == SinglePartition && !isCompactProducer(e.child) =>
      s"single-partition:${strip(e.child).nodeName}"
    case _: CartesianProductExec => "cartesian-product"
    case j: BroadcastNestedLoopJoinExec if !compactBroadcastSide(j) => "broadcast-nested-loop"
    case f: FilterExec if unpushed(f).nonEmpty => s"unpushed-scan-filter:${unpushed(f).get}"
  }

  private def compactBroadcastSide(j: BroadcastNestedLoopJoinExec): Boolean = {
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val side = j.buildSide match {
      case BuildLeft  => j.left
      case BuildRight => j.right
    }
    strip(side) match {
      case b: BroadcastExchangeExec => isCompactProducer(b.child)
      case p => isCompactProducer(p)
    }
  }

  /** Filter directly over a parquet scan into which nothing was pushed. */
  private def unpushed(f: FilterExec): Option[String] = strip(f.child) match {
    case s: FileSourceScanExec if s.dataFilters.isEmpty =>
      Some(s.relation.location.rootPaths.headOption.map(_.getName).getOrElse("?"))
    case _ => None
  }

  def violations(df: DataFrame): Seq[String] = violations(staticPlan(df))
}
