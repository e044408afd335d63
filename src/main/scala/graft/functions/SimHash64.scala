package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a whitespace-tokenized text column, as a native
  * Catalyst expression (preference order (b) from the build brief: a
  * custom `Expression` where built-ins can't express the semantics —
  * SimHash needs per-token bit voting, which has no `functions._`
  * composition that wouldn't explode 64 columns).
  *
  * Token hashes come from the first 8 bytes of MD5 (stable across JVMs,
  * versions and engines — no dependence on Spark's internal seed choices).
  * Each token votes ±1 on each of 64 bit positions; the signature takes
  * the sign. Near-duplicate texts differ in few bits, so hamming distance
  * on signatures approximates token-multiset difference.
  *
  * Dedup at scale: [[simHashPairs]]-style banding — split the 64 bits
  * into 4 chunks of 16; by pigeonhole, any pair within hamming ≤ 3 agrees
  * exactly on ≥ 1 chunk, so bucket-join on chunks, then verify with
  * bit_count(xor) — no cross join.
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    SimHash64.compute(text)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Stable 64-bit token hash: first 8 bytes of MD5, big-endian. */
  def tokenHash(token: String): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(token.getBytes(StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  def compute(text: String): Long = {
    val votes = new Array[Int](64)
    val it = text.split(" ").iterator
    while (it.hasNext) {
      val tok = it.next()
      if (tok.nonEmpty) {
        val h = tokenHash(tok)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Column API: `simhash64($"text")`. */
  def simhash64(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))
  }
}
