package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DecimalType, LongType}

/** Exact 128-bit integer sum of a LONG column, evaluated as
  * DECIMAL(38,0).
  *
  * WHY: Spark's decimal `sum` with a > 18-digit buffer stores the
  * accumulator as a serialized BigDecimal in the aggregation row — every
  * row pays deserialize + BigDecimal add + reserialize (measured 2.5× the
  * cost of a long sum on the exact-moments scan). This aggregate keeps
  * the accumulator as TWO PRIMITIVE LONGS (hi, lo) in the fixed-width
  * UnsafeRow fast path, adds with a branch-free carry (pure long
  * bit-ops, whole-stage codegen'd as a [[DeclarativeAggregate]]), and
  * converts to decimal ONCE per group at eval. Exact for any input the
  * long domain can express. Headroom: the two-long accumulator itself
  * wraps only past 2¹²⁷, but the RESULT contract is DECIMAL(38,0) —
  * |Σ| must stay below 10³⁸ (a 10³⁸-to-2¹²⁷ sum fails LOUDLY at eval
  * with an explicit overflow message, never a wrapped value), which
  * still fits 10¹⁸ rows of 10²⁰-scale products per group. Two's-
  * complement sign extension makes negative inputs exact too.
  *
  * The CALLER must guarantee each per-row input fits a LONG (e.g. guard
  * fixed-point products with a double-magnitude check and a decimal
  * fallback/raise_error branch) — this aggregate is exact over longs, it
  * cannot see an overflow that happened producing them.
  *
  * NULL semantics DIVERGE from SQL `sum` deliberately: null inputs
  * contribute 0 and an all-null (or empty) group evaluates to 0, not
  * NULL — the moments contract ([[graft.ops.Stats]]) filters non-finite
  * rows up front and treats the sum as a COUNT-like total, where a
  * never-null result keeps the derived-statistic arithmetic null-free.
  * Callers needing SQL's NULL-on-empty must wrap with a count guard. */
case class Sum128(child: Expression) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DecimalType(38, 0)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sum128 expects BIGINT, got ${child.dataType}")

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L))

  // 128-bit two's-complement add of (aHi, aLo) + (bHi, bLo):
  //   lo' = aLo + bLo (wrapping)
  //   carry-out = ((aLo & bLo) | ((aLo | bLo) & ~lo')) >>> 63
  //   hi' = aHi + bHi + carry
  private def add128(aHi: Expression, aLo: Expression,
                     bHi: Expression, bLo: Expression): Seq[Expression] = {
    val newLo = Add(aLo, bLo, EvalMode.LEGACY)
    val carry = ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(aLo, bLo),
        BitwiseAnd(BitwiseOr(aLo, bLo), BitwiseNot(newLo))),
      Literal(63))
    val newHi = Add(Add(aHi, bHi, EvalMode.LEGACY), carry, EvalMode.LEGACY)
    Seq(newHi, newLo)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    // NULL input contributes 0 (SQL sum semantics over non-null rows)
    val v = If(IsNull(child), Literal(0L), child)
    // sign-extend the long into 128 bits: hi limb = v >> 63 (0 or -1)
    add128(hi, lo, ShiftRight(v, Literal(63)), v)
  }

  override lazy val mergeExpressions: Seq[Expression] =
    add128(hi.left, lo.left, hi.right, lo.right)

  override lazy val evaluateExpression: Expression =
    Int128ToDecimal(hi, lo)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Sum128 =
    copy(child = newChildren.head)

  override def prettyName: String = "sum128"
}

/** (hi, lo) 128-bit two's-complement → DECIMAL(38,0). Runs once per
  * GROUP (Sum128's eval), so interpreted BigDecimal math is fine. */
case class Int128ToDecimal(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"int128_to_decimal expects (BIGINT, BIGINT), got " +
          s"(${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(hi: Any, lo: Any): Any =
    Int128ToDecimal.toDecimal(hi.asInstanceOf[Long], lo.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, l) =>
      s"graft.functions.Int128ToDecimal.toDecimal($h, $l)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int128ToDecimal =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "int128_to_decimal"
}

object Int128ToDecimal {
  private val TwoTo64 = java.math.BigDecimal.valueOf(2).pow(64)

  private val DecMax = java.math.BigDecimal.TEN.pow(38)

  /** Shared by interpreted eval and generated code — keep public. */
  def toDecimal(hi: Long, lo: Long): org.apache.spark.sql.types.Decimal = {
    // value = hi·2⁶⁴ + unsigned(lo)
    val loUnsigned =
      if (lo >= 0) java.math.BigDecimal.valueOf(lo)
      else java.math.BigDecimal.valueOf(lo).add(TwoTo64)
    val v = java.math.BigDecimal.valueOf(hi).multiply(TwoTo64).add(loUnsigned)
    // the accumulator holds up to 2¹²⁷ but the result type caps at
    // DECIMAL(38): fail with the documented contract, not an opaque
    // precision error from Decimal.toPrecision
    if (v.abs.compareTo(DecMax) >= 0)
      throw new ArithmeticException(
        s"sum128: |$v| exceeds the DECIMAL(38,0) result range (10^38) — " +
          "the group's sum is exact in the 128-bit accumulator but not " +
          "representable in the declared output type; rescale the input")
    org.apache.spark.sql.types.Decimal(new scala.math.BigDecimal(v), 38, 0)
  }
}

object Sum128 {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Aggregate Column: exact Σ of a BIGINT column as DECIMAL(38,0). */
  def sum128(c: Column): Column =
    ColumnBridge.column(
      Sum128(ColumnBridge.expression(c)).toAggregateExpression())
}
