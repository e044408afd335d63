package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Deterministic argmax over a (ord: BIGINT, value: BIGINT) pair under
  * the LEXICOGRAPHIC (ord, value) total order — returns the `value` of
  * the greatest pair, i.e. ties on `ord` resolve to the LARGEST value.
  *
  * WHY: `max(struct(ord, value))` is the natural Spark spelling but a
  * struct aggregation buffer is an immutable type, so the planner falls
  * back to SortAggregate — which sorts every pre-aggregation row on the
  * grouping key before combining. This aggregate keeps THREE PRIMITIVE
  * buffer slots (ord, value, seen) in the UnsafeRow fast path, so the
  * plan is a whole-stage-codegen HashAggregate: rows combine in place,
  * nothing is sorted, nothing leaves codegen.
  *
  * WHEN (measured, r15): it pays only where the pre-agg rows reach the
  * aggregate UNSORTED by group — shuffle-fed argmax shapes — because
  * that is where SortAggregate pays a real sort. On the one crossJoin
  * argmax in the repo ([[graft.ops.Similarity.assignCells]]) it was
  * built and REJECTED on measurement (isolated best-of-3 at the
  * 200k-vector replica: 32.5 s struct form vs 41–45 s this form): the
  * crossJoin emits each group's k rows consecutively, so the sort ran
  * on presorted runs (~linear) and the wall was the exact dot folds,
  * while this form added per-row hash probes and a vector join-back
  * exchange. Kept, registered and spec'd as the primitive for the
  * shuffle-fed case.
  *
  * The caller packs its ordering into ONE signed long — for doubles use
  * [[SortableDoubleBits]] (order-preserving, NaN above +Inf, and never
  * Long.MinValue for any real double, so MinValue is free as a
  * "null ordering" sentinel band that mirrors struct comparison's
  * nulls-first placement).
  *
  * NULL semantics: rows where `ord` or `value` is NULL are skipped
  * (SQL max semantics); an empty/all-null group evaluates to NULL. */
case class ArgMaxLong(ord: Expression, value: Expression)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(ord, value)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (ord.dataType == LongType && value.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"argmax_long expects (BIGINT, BIGINT), got " +
          s"(${ord.dataType}, ${value.dataType})")

  private lazy val bOrd = AttributeReference("ord", LongType, nullable = false)()
  private lazy val bVal = AttributeReference("val", LongType, nullable = false)()
  private lazy val seen = AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bOrd, bVal, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  // (o2, v2) beats (o1, v1) lexicographically
  private def beats(o2: Expression, v2: Expression,
                    o1: Expression, v1: Expression): Expression =
    Or(GreaterThan(o2, o1), And(EqualTo(o2, o1), GreaterThan(v2, v1)))

  override lazy val updateExpressions: Seq[Expression] = {
    val valid = And(IsNotNull(ord), IsNotNull(value))
    val take = And(valid, Or(Not(seen), beats(ord, value, bOrd, bVal)))
    Seq(
      If(take, ord, bOrd),
      If(take, value, bVal),
      Or(seen, valid))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val take = And(seen.right,
      Or(Not(seen.left), beats(bOrd.right, bVal.right, bOrd.left, bVal.left)))
    Seq(
      If(take, bOrd.right, bOrd.left),
      If(take, bVal.right, bVal.left),
      Or(seen.left, seen.right))
  }

  override lazy val evaluateExpression: Expression =
    If(seen, bVal, Literal(null, LongType))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArgMaxLong =
    copy(ord = newChildren(0), value = newChildren(1))

  override def prettyName: String = "argmax_long"
}

object ArgMaxLong {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Aggregate Column: value at the lexicographic max of (ord, value);
    * NULL on an empty/all-null group. */
  def argmaxLong(ord: Column, value: Column): Column =
    ColumnBridge.column(
      ArgMaxLong(ColumnBridge.expression(ord),
        ColumnBridge.expression(value)).toAggregateExpression())
}
