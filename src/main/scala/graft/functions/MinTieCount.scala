package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** Minimum of an orderable column PLUS the number of rows that attain
  * it, in one aggregation: `struct(min: T, ties: BIGINT)`.
  *
  * WHY: the argmin-flag rewrite (e.g. the customer-sales-report
  * top-performer, `pipelines/CustomerSalesReport.scala`) replaces a
  * per-group `row_number()` window with `min(ordKey)` + a join-back —
  * but `min` alone cannot see whether the minimum is UNIQUE. When two
  * rows tie on the full ordering key, flag-by-equality marks BOTH where
  * `row_number` marks one: a silent multiset divergence from the
  * reference (r13 advice, medium). Since no deterministic per-row
  * expression can pick one of two identical rows, the correct posture is
  * a LOUD runtime guard — which needs the tie count. Fusing it into the
  * min aggregation keeps the argmin plan shape (one aggregation, one
  * join-back) instead of adding a second per-(group, key) aggregation
  * whose shuffle would be row-scale, not group-scale.
  *
  * Execution class: identical to the built-in `min` over the same type.
  * For a struct ordering key neither is UnsafeRow-mutable, so both plan
  * as SortAggregate with map-side partials — the payload grows by one
  * long per group.
  *
  * NULL inputs contribute nothing (SQL `min` semantics); an all-null or
  * empty group evaluates to `struct(NULL, 0)`. */
case class MinTieCount(child: Expression) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("min", child.dataType, nullable = true),
    StructField("ties", LongType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (RowOrdering.isOrderable(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"min_tie_count expects an orderable type, got ${child.dataType}")

  private lazy val m =
    AttributeReference("m", child.dataType, nullable = true)()
  private lazy val c = AttributeReference("c", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(m, c)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, child.dataType), Literal(0L))

  override lazy val updateExpressions: Seq[Expression] = {
    val better = Or(IsNull(m), LessThan(child, m))
    Seq(
      If(IsNull(child), m, If(better, child, m)),
      If(IsNull(child), c,
        If(better, Literal(1L),
          If(EqualTo(child, m),
            Add(c, Literal(1L), EvalMode.LEGACY), c))))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val rightBetter = And(IsNotNull(m.right),
      Or(IsNull(m.left), LessThan(m.right, m.left)))
    Seq(
      If(rightBetter, m.right, m.left),
      If(rightBetter, c.right,
        If(And(IsNotNull(m.left), EqualTo(m.left, m.right)),
          Add(c.left, c.right, EvalMode.LEGACY), c.left)))
  }

  override lazy val evaluateExpression: Expression =
    CreateNamedStruct(Seq(
      Literal("min"), m,
      Literal("ties"), c))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinTieCount =
    copy(child = newChildren.head)

  override def prettyName: String = "min_tie_count"
}

object MinTieCount {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Aggregate Column: `struct(min, ties)` of an orderable column. */
  def minTieCount(col: Column): Column =
    ColumnBridge.column(
      MinTieCount(ColumnBridge.expression(col)).toAggregateExpression())
}
