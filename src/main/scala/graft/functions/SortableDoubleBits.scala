package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-preserving IEEE-754 double → signed long mapping:
  * `bits >= 0 ? bits : Long.MinValue - bits` (so +x keeps its bit
  * pattern, −x maps to −magnitude; ±0.0 both map to 0). For any finite
  * doubles a < b, map(a) < map(b) as SIGNED longs — which turns the
  * integral-only distributed selection in [[graft.ops.Quantiles]] into
  * an exact selection over doubles. The inverse is the same formula.
  * NaN maps above +Infinity (same "NaN last" order Spark and DuckDB
  * use for sorting). Whole-stage codegen'd — one compare + subtract. */
case class SortableDoubleBits(child: Expression) extends UnaryExpression {

  // type check at analysis time (the child is unresolved at construction;
  // the ExpectsInputTypes contract isn't available to external
  // expressions — AbstractDataType is private[sql] in Spark 4)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sortable_double_bits expects DOUBLE, got ${child.dataType}")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SortableDoubleBits.toSortable(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.SortableDoubleBits.toSortable($c)""")

  override protected def withNewChildInternal(newChild: Expression): SortableDoubleBits =
    copy(child = newChild)

  override def prettyName: String = "sortable_double_bits"
}

object SortableDoubleBits {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Forward mapping (also used from generated code — keep public). */
  def toSortable(d: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(d)
    if (bits >= 0) bits else java.lang.Long.MIN_VALUE - bits
  }

  /** Inverse of [[toSortable]]. */
  def fromSortable(s: Long): Double = {
    val bits = if (s >= 0) s else java.lang.Long.MIN_VALUE - s
    java.lang.Double.longBitsToDouble(bits)
  }

  def sortableDoubleBits(c: Column): Column =
    ColumnBridge.column(SortableDoubleBits(ColumnBridge.expression(c)))
}
