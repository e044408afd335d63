package graft.functions

import java.util.{Arrays => JArrays, PriorityQueue}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}

/** One heap entry: the lexicographic order key (largest-first wins a
  * top-k slot) and the payload row's UnsafeRow bytes. Bytes — not the
  * row — so serialize/compare need no per-call copies; the row is
  * re-materialized only at [[TopKRows.eval]]. */
private[graft] final class TopKEntry(val ord: Array[Long], val bytes: Array[Byte])

/** Exact top-k rows per group as ONE bounded-state aggregate: buffer = a
  * k-capped min-heap of (order key, payload row), update = heap insert,
  * merge = heap union — associative and commutative, so Spark runs it
  * partial+final like any hash aggregate.
  *
  * Why not `row_number().over(Window.partitionBy(g).orderBy(o)) <= k`
  * (the reference's own top-per-group idiom, e.g. Raptor.py's ranked
  * samples): the window form shuffles EVERY row of the input to its
  * group's reducer and sorts full partitions before discarding all but
  * k·|groups| rows. This aggregate discards during the scan — the
  * shuffle after partial aggregation carries at most k rows per group
  * per map partition, and nothing is ever sorted beyond k-element heap
  * maintenance. At a 100 TB scan with k=3 the exchange shrinks from the
  * full corpus to ~k·partitions rows per group; see SCALE.md for the
  * measured law.
  *
  * Ordering contract: `ord` is an array<long> compared lexicographically,
  * LARGEST first — encode "descending value, ascending id" orders into
  * the longs via [[graft.ops.TopK]] (doubles through [[SortableDoubleBits]],
  * ascending components through bitwise NOT). Ties on the full key fall
  * back to unsigned payload-byte order so the result is deterministic
  * even under non-total keys (payload bytes ARE the row, so equal bytes
  * are the same row). Null ord/payload rows are skipped.
  */
case class TopKRows(ord: Expression, payload: Expression, k: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PriorityQueue[TopKEntry]] {

  require(k >= 1, s"top-k needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(ord, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(payload.dataType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (ord.dataType, payload.dataType) match {
      case (ArrayType(LongType, _), _: StructType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (o, p) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"topk_rows expects (ARRAY<BIGINT>, STRUCT), got ($o, $p)")
    }

  private def payloadSchema: StructType = payload.dataType.asInstanceOf[StructType]
  @transient private lazy val proj = UnsafeProjection.create(payloadSchema)

  override def createAggregationBuffer(): PriorityQueue[TopKEntry] =
    new PriorityQueue[TopKEntry](k, TopKRows.SmallestFirst)

  private def insert(pq: PriorityQueue[TopKEntry], e: TopKEntry): Unit =
    if (pq.size < k) pq.add(e)
    else if (TopKRows.SmallestFirst.compare(e, pq.peek) > 0) { pq.poll(); pq.add(e) }

  override def update(pq: PriorityQueue[TopKEntry], input: InternalRow): PriorityQueue[TopKEntry] = {
    val o = ord.eval(input)
    val p = payload.eval(input)
    if (o != null && p != null) {
      val key = o.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
      // cheap reject before materializing row bytes: a full heap whose
      // floor beats this key never stores the row
      if (pq.size < k ||
          TopKRows.compareKeys(key, pq.peek.ord) >= 0) {
        // copy() before getBytes: the projection REUSES its target buffer,
        // and getBytes returns the backing array uncopied when the row
        // exactly fills it — without the copy every entry aliases the
        // latest row
        val bytes = proj(p.asInstanceOf[InternalRow]).copy().getBytes()
        insert(pq, new TopKEntry(key, bytes))
      }
    }
    pq
  }

  override def merge(a: PriorityQueue[TopKEntry], b: PriorityQueue[TopKEntry]): PriorityQueue[TopKEntry] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  override def eval(pq: PriorityQueue[TopKEntry]): Any = {
    val n = payloadSchema.length
    val entries = new Array[TopKEntry](pq.size)
    pq.toArray(entries)
    JArrays.sort(entries, TopKRows.SmallestFirst.reversed())
    new GenericArrayData(entries.map { e =>
      val r = new UnsafeRow(n)
      r.pointTo(e.bytes, e.bytes.length)
      r: Any
    })
  }

  override def serialize(pq: PriorityQueue[TopKEntry]): Array[Byte] = {
    var size = 4
    val it0 = pq.iterator()
    while (it0.hasNext) { val e = it0.next(); size += 8 + 8 * e.ord.length + e.bytes.length }
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(pq.size)
    val it = pq.iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putInt(e.ord.length)
      e.ord.foreach(bb.putLong)
      bb.putInt(e.bytes.length)
      bb.put(e.bytes)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[TopKEntry] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val pq = createAggregationBuffer()
    var n = bb.getInt
    while (n > 0) {
      val ordLen = bb.getInt
      val ord = Array.fill(ordLen)(bb.getLong)
      val rowLen = bb.getInt
      val row = new Array[Byte](rowLen)
      bb.get(row)
      pq.add(new TopKEntry(ord, row)) // ≤ k entries by construction
      n -= 1
    }
    pq
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKRows =
    copy(ord = newChildren(0), payload = newChildren(1))

  override def prettyName: String = "topk_rows"
}

object TopKRows {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Lexicographic on the long key (signed), unsigned payload-byte
    * tiebreak. Heap root = SMALLEST retained entry (the eviction floor). */
  private[graft] val SmallestFirst: java.util.Comparator[TopKEntry] =
    new java.util.Comparator[TopKEntry] {
      override def compare(a: TopKEntry, b: TopKEntry): Int = {
        val c = compareKeys(a.ord, b.ord)
        if (c != 0) c
        else JArrays.compareUnsigned(a.bytes, b.bytes)
      }
    }

  private[graft] def compareKeys(a: Array[Long], b: Array[Long]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = java.lang.Long.compare(a(i), b(i))
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(a.length, b.length)
  }

  /** Aggregate Column: `topKRows(array(<sortable longs>), struct(<payload>), k)`. */
  def topKRows(ord: Column, payload: Column, k: Int): Column =
    ColumnBridge.column(
      TopKRows(ColumnBridge.expression(ord), ColumnBridge.expression(payload), k)
        .toAggregateExpression())
}
