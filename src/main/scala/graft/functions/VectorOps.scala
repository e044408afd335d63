package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, ArrayType}

/** Sequential-fold dot product of two array columns as a native Catalyst
  * expression with whole-stage codegen (preference order (b) from the
  * build brief: the `zip_with`+`aggregate` HOF composition expresses the
  * same fold but is interpreted per element — ~20× slower on the hot
  * pair-join path of [[graft.ops.Dedup.cosinePairs]]).
  *
  * Semantics are identical to the HOF form bit-for-bit: each element is
  * widened to double, multiplied, and accumulated LEFT-TO-RIGHT (IEEE
  * sequential fold — the same order DuckDB's `list_reduce` uses, so the
  * oracle hash-compare stays exact).
  *
  * Ragged inputs THROW (ADVICE r15): truncating to the shorter array
  * would silently diverge from DuckDB's `list_zip`, which NULL-pads the
  * shorter list and turns the whole fold NULL — a latent hash mismatch
  * masked only while every fixture is uniformly 64-dim. A length
  * mismatch is a data bug either way; fail loudly with both lengths.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"dot_product: ragged arrays (${n} vs ${y.numElements()} elements)")
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_product: ragged arrays (" + $n + " vs " +
         |    $b.numElements() + " elements)");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.$lGet($i) * (double) $b.$rGet($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

/** Sequential-fold squared L2 distance `Σ (aᵢ − bᵢ)²` — the PQ/ADC
  * distance kernel ([[graft.ops.Similarity.pqTopK]]). Same contract as
  * [[DotProduct]]: elements widen to double and accumulate
  * LEFT-TO-RIGHT, so DuckDB's `list_reduce` over `list_zip` replays the
  * fold bit-for-bit and the oracle hash-compare stays exact. One fused
  * subtract-square-accumulate loop beats the `dot(a,a) − 2·dot(a,b) +
  * dot(b,b)` expansion on both rounding (single fold, no catastrophic
  * cancellation) and traffic (one pass over both arrays). Ragged inputs
  * THROW — same contract and rationale as [[DotProduct]]. */
case class L2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"l2_sq: ragged arrays (${n} vs ${y.numElements()} elements)")
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "l2_sq: ragged arrays (" + $n + " vs " +
         |    $b.numElements() + " elements)");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.$lGet($i) - (double) $b.$rGet($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "l2_sq"
}

object VectorOps {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** `dot(a, b)` — codegen'd sequential-fold dot product. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** `l2sq(a, b)` — codegen'd sequential-fold squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    ColumnBridge.column(L2Sq(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
