package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Group buffer: every value seen while ≤ cap of them exist, plus the
  * true running count. Once the count passes the cap the values stop
  * mattering (the group is "big" and the caller falls back to the
  * selection protocol), so the buffer is DROPPED at that moment — an
  * over-cap partial holds, serializes, and shuffles only the 8-byte
  * count, never cap longs. Invariant everywhere: `vals.length == count`
  * while count ≤ cap, `vals.isEmpty` once count > cap. */
private[graft] final class CappedLongsBuf(var count: Long,
                                          val vals: ArrayBuffer[Long])

/** The complete sorted value list of a group — IF the group is small.
  *
  * `capped_sorted_longs(v, cap)` evaluates to the ascending-sorted array
  * of the group's non-null values when the group holds ≤ cap of them,
  * and NULL otherwise. The buffer is hard-bounded at `cap` longs no
  * matter how large the group actually is (past the cap the values are
  * dropped and only the count advances), so — unlike `collect_list`,
  * whose buffer grows with the group — a 100 TB group transiently costs
  * ≤ 8·cap bytes of aggregation state, serializes/shuffles as just its
  * count once over cap, and returns NULL.
  *
  * This is the one-job engine of [[graft.ops.Quantiles]]' small-group
  * fast path: one grouped aggregation yields bounds, counts, the exact
  * per-rank values of every small group (`element_at` on the sorted
  * array, executor-side), and a NULL overflow marker routing big groups
  * to the scale-safe selection protocol. Associative + commutative
  * (merge concatenates under the cap), so Spark runs it partial+final
  * like any hash aggregate; ties/order don't matter because the final
  * sort is total on longs. */
case class CappedSortedLongs(child: Expression, cap: Int,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedLongsBuf] {

  require(cap >= 1, s"capped_sorted_longs needs cap >= 1, got $cap")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case o =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"capped_sorted_longs expects BIGINT, got $o")
    }

  override def createAggregationBuffer(): CappedLongsBuf =
    new CappedLongsBuf(0L, new ArrayBuffer[Long])

  override def update(b: CappedLongsBuf, input: InternalRow): CappedLongsBuf = {
    val v = child.eval(input)
    if (v != null) {
      b.count += 1
      if (b.count <= cap) b.vals += v.asInstanceOf[Long]
      // the first over-cap value proves the GROUP is over cap (the true
      // count only grows downstream), so the buffered values can never
      // reach eval as a complete list — free them now instead of
      // shipping cap longs of dead weight through the shuffle
      else if (b.vals.nonEmpty) b.vals.clear()
    }
    b
  }

  override def merge(a: CappedLongsBuf, b: CappedLongsBuf): CappedLongsBuf = {
    a.count += b.count
    if (a.count > cap) { if (a.vals.nonEmpty) a.vals.clear() }
    else a.vals ++= b.vals // both complete (counts ≤ cap pre-merge)
    a
  }

  override def eval(b: CappedLongsBuf): Any =
    // complete iff nothing was ever dropped: the stored values ARE the
    // group (count ≤ cap); a capped group evaluates to NULL
    if (b.count == b.vals.length) {
      val arr = b.vals.toArray
      java.util.Arrays.sort(arr)
      new GenericArrayData(arr)
    } else null

  override def serialize(b: CappedLongsBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + 8 * b.vals.length)
    bb.putLong(b.count)
    bb.putInt(b.vals.length)
    b.vals.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedLongsBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val count = bb.getLong
    var n = bb.getInt
    val vals = new ArrayBuffer[Long](n)
    while (n > 0) { vals += bb.getLong; n -= 1 }
    new CappedLongsBuf(count, vals)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedSortedLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedSortedLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CappedSortedLongs =
    copy(child = newChildren(0))

  override def prettyName: String = "capped_sorted_longs"
}

object CappedSortedLongs {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Aggregate Column: sorted array of the group's values, or NULL when
    * the group holds more than `cap` non-null values. */
  def cappedSortedLongs(v: Column, cap: Int): Column =
    ColumnBridge.column(
      CappedSortedLongs(ColumnBridge.expression(v), cap).toAggregateExpression())
}
