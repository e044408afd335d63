package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Order-preserving fixed-width long encoding of a string, for string
  * sort keys inside [[TopKRows]]' long-array ordering (e.g. the bm25
  * per-document top-k's `token ASC` tiebreak — a window-free top-k needs
  * the STRING order expressed as sortable longs).
  *
  * The UTF-8 bytes are packed big-endian into `nLongs` longs
  * (zero-padded), each XOR'd with `Long.MinValue` so SIGNED long
  * comparison reproduces UNSIGNED byte order — which is exactly Spark's
  * UTF8String binary comparison and DuckDB's default BINARY collation,
  * so rankings agree bit-for-bit across engines. With `invert` the longs
  * are XOR'd with `Long.MaxValue` instead (bitwise NOT of the ascending
  * form): the ascending-string contribution for [[TopKRows]]'
  * largest-first retention, mirroring [[graft.ops.TopK.ordAsc]].
  *
  * A FINAL length long disambiguates zero-padding from real NUL bytes:
  * strings equal up to trailing 0x00 (where padded prefixes tie) order
  * by byte length, exactly the binary rule ("a" < "a\u0000"). Strings
  * longer than `nLongs`·8 bytes FAIL LOUDLY (the prefix would tie and
  * the heap's payload-byte fallback is not string order — a silent
  * misranking); size `nLongs` for the domain. The default (32 longs =
  * 256 bytes) covers any natural-language token INCLUDING URL-shaped
  * whitespace tokens; past it (base64 blobs, minified payloads) the
  * loud error tells the caller to normalize or raise the cap.
  * Codegen'd: one static call, no boxing beyond the output array. */
case class StringOrdLongs(child: Expression, nLongs: Int, invert: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && nLongs > 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"string_ord_longs expects STRING and nLongs > 0, got " +
          s"${child.dataType} / $nLongs")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    StringOrdLongs.encode(input.asInstanceOf[UTF8String], nLongs, invert)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StringOrdLongs.encode($c, $nLongs, $invert)")

  override protected def withNewChildInternal(newChild: Expression): StringOrdLongs =
    copy(child = newChild)

  override def prettyName: String = "string_ord_longs"
}

object StringOrdLongs {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Shared by interpreted eval and generated code — keep public. */
  def encode(s: UTF8String, nLongs: Int, invert: Boolean): ArrayData = {
    val bytes = s.getBytes
    if (bytes.length > nLongs * 8)
      throw new IllegalArgumentException(
        s"string_ord_longs: value of ${bytes.length} UTF-8 bytes exceeds " +
          s"the $nLongs-long (${nLongs * 8}-byte) ordering capacity — " +
          "raise nLongs; truncating would silently misrank")
    val out = new Array[Long](nLongs + 1)
    val flip = if (invert) Long.MaxValue else Long.MinValue
    var i = 0
    while (i < nLongs) {
      var v = 0L
      var j = 0
      while (j < 8) {
        val idx = i * 8 + j
        val b = if (idx < bytes.length) bytes(idx) & 0xffL else 0L
        v = (v << 8) | b
        j += 1
      }
      out(i) = v ^ flip
      i += 1
    }
    // length long: the only differentiator when the padded prefixes tie
    // (strings equal up to trailing NUL bytes) — shorter sorts first,
    // the UTF8String binary rule
    out(nLongs) = bytes.length.toLong ^ flip
    ArrayData.toArrayData(out)
  }

  /** Ascending-string ordering contribution (array of sortable longs)
    * for a largest-first top-k heap; concat with the scalar ord keys. */
  def stringOrdAsc(c: Column, nLongs: Int = 32): Column =
    ColumnBridge.column(StringOrdLongs(ColumnBridge.expression(c), nLongs,
      invert = true))

  /** Descending-string contribution. */
  def stringOrdDesc(c: Column, nLongs: Int = 32): Column =
    ColumnBridge.column(StringOrdLongs(ColumnBridge.expression(c), nLongs,
      invert = false))
}
