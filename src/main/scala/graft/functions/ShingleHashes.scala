package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a whitespace-tokenized text column,
  * emitted directly as 64-bit xxhash64 values — a native Catalyst
  * expression replacing the `transform(sequence(...), element_at×n)` HOF
  * composition, which is interpreted per gram and ~100× slower on a
  * 100 TB-scale dedup scan (measured 10s for 5k docs vs <0.1s here).
  *
  * Equality classes are IDENTICAL to the string-shingle form
  * ([[graft.ops.Dedup.shingles]]): tokens split on single spaces with
  * trailing empties KEPT (Spark `split(text,' ')` / DuckDB `string_split`
  * semantics), grams joined with one space, the joined string hashed.
  * Two grams hash equal iff their joined strings are equal (mod 64-bit
  * collisions, ~n²/2⁶⁴), so Jaccard counts over these hashes match the
  * DuckDB string-shingle oracle exactly.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // limit -1: keep trailing empty tokens (Spark SQL split semantics)
    val toks = text.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(XXH64.hashUTF8String(UTF8String.fromString(sb.toString), 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** `shingleHashes($"text", 3)` — distinct hashed word n-grams. */
  def shingleHashes(c: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(c), n))
}
