package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `numHashes` MinHash signature slots as ONE imperative aggregate
  * over the hashed-shingle column: buffer = long[numHashes], update =
  * elementwise min of the affine rehashes, merge = elementwise min —
  * associative/commutative, so Spark runs it partial+final with no
  * ordering sensitivity.
  *
  * Replaces the 128-separate-`min()`-columns formulation: one aggregate
  * expression instead of 128 (the wide plan cost ~2s of whole-stage
  * codegen alone per JVM), one tight JVM loop per row, one array column
  * out.
  *
  * Coefficients must match [[graft.ops.Dedup.coeffs]] (passed in), so
  * signatures equal the column-wise formulation exactly.
  */
case class MinHashSketch(child: Expression,
                         coeffs: Seq[(Long, Long)], prime: Long,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val n = coeffs.length
  private val as = coeffs.map(_._1).toArray
  private val bs = coeffs.map(_._2).toArray

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(n)(Long.MaxValue)

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = java.lang.Math.floorMod(v.asInstanceOf[Long], prime)
      var i = 0
      while (i < n) {
        val x = java.lang.Math.floorMod(h * as(i) + bs(i), prime)
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * n)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(n)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashSketch =
    copy(child = newChildren.head)

  override def prettyName: String = "minhash_sketch"
}

object MinHashSketch {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Aggregate Column: `minhashSketch($"shash", coeffs, prime)`. */
  def minhashSketch(c: Column, coeffs: Seq[(Long, Long)], prime: Long): Column =
    ColumnBridge.column(
      MinHashSketch(ColumnBridge.expression(c), coeffs, prime)
        .toAggregateExpression())
}
