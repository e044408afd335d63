package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, ByteType, DataType, IntegerType,
  LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a serialized Bloom filter — the executor-side
  * half of [[graft.ops.BloomJoin]]'s semi/anti join reduction.
  *
  * The filter bytes ride the expression into the task binary (hundreds of
  * KB for millions of keys — broadcast-sized, not data-sized) and are
  * deserialized once per executor thread on first eval. Integral keys
  * probe as the widened long, strings as UTF-8 — matching exactly how
  * [[graft.ops.BloomJoin.buildFilter]] inserted them.
  *
  * NULL probes return FALSE (not null): a null key is never a member of
  * the build side, which is precisely SQL's join semantics — an anti join
  * keeps null-key rows (null = nothing matches), a semi join drops them —
  * and returning false routes both cases correctly without a separate
  * null branch in the caller.
  */
case class BloomMightContain(child: Expression,
                             filterBytes: BloomMightContain.FilterBytes)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType

  override def nullable: Boolean = false

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes.bytes))

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false
    else child.dataType match {
      case LongType => filter.mightContainLong(v.asInstanceOf[Long])
      case IntegerType => filter.mightContainLong(v.asInstanceOf[Int].toLong)
      case ShortType => filter.mightContainLong(v.asInstanceOf[Short].toLong)
      case ByteType => filter.mightContainLong(v.asInstanceOf[Byte].toLong)
      case StringType => filter.mightContainString(v.asInstanceOf[UTF8String].toString)
      case other =>
        throw new IllegalArgumentException(s"bloom probe on unsupported type $other")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContain {

  /** Filter bytes with CONTENT equality. A bare `Array[Byte]` field
    * compares referentially inside the case-class product, so two
    * semantically identical probe expressions never canonicalize equal —
    * defeating common-subexpression reuse (e.g. bloomAntiJoin's probe
    * evaluated twice over the left side). Same idea as Spark's own
    * BloomFilterMightContain, which carries the bytes as a BinaryType
    * Literal (whose equals is content-based). */
  final class FilterBytes(val bytes: Array[Byte]) extends Serializable {
    override def equals(o: Any): Boolean = o match {
      case f: FilterBytes => java.util.Arrays.equals(bytes, f.bytes)
      case _ => false
    }
    // cached: Catalyst hashes expressions repeatedly during
    // canonicalization / semantic-equality / attribute-map lookups, and a
    // production filter is hundreds of KB — one pass at construction
    override val hashCode: Int = java.util.Arrays.hashCode(bytes)
    // keep plan strings readable: never dump hundreds of KB of bytes
    override def toString: String = s"bloom_filter(${bytes.length}B)"
  }

  /** Column API: `mightContain($"key", bytes)`. */
  def mightContain(c: Column, filterBytes: Array[Byte]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      BloomMightContain(ColumnBridge.expression(c), new FilterBytes(filterBytes)))
  }
}
