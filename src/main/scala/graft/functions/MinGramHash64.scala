package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing min-gram fingerprint as a native expression: the minimum
  * over all k-char windows of the polynomial hash
  * `fold((acc*31 + code) % P)` — computed with a TRUE ROLLING update
  * (subtract the outgoing char's `B^(k-1)` term, multiply by B, add the
  * incoming char, all mod P), so one pass O(len) instead of the
  * HOF `transform(sequence, i -> aggregate(slice))` composition, which
  * is O(len·k) with interpreted lambdas (measured 106 s for 5k docs at
  * sf0.1 — this expression does the same corpus in well under a second).
  *
  * Values are IDENTICAL to the HOF/oracle definition: the rolling update
  * is algebraically the same polynomial mod P (cross-checked in
  * TextAnalysisSpec). Falls back to the whole-text hash when the text is
  * shorter than k, matching [[graft.ops.TextAnalysis.minGramFingerprint]].
  */
case class MinGramHash64(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    MinGramHash64.compute(s, k)
  }

  override protected def withNewChildInternal(newChild: Expression): MinGramHash64 =
    copy(child = newChild)

  override def prettyName: String = "min_gram_hash64"
}

object MinGramHash64 {
  val P = 1000000007L
  val B = 31L

  /** `B^(k-1) mod P` — the outgoing-character weight. */
  private def pow(k: Int): Long = {
    var r = 1L
    var i = 1
    while (i < k) { r = (r * B) % P; i += 1 }
    r
  }

  def compute(s: String, k: Int): Long = {
    // code points, not UTF-16 units: the HOF form folds over
    // split(text,'') characters whose ascii() is the code point
    val cp = s.codePoints().toArray
    val n = cp.length
    // short text: whole-text fold (same fallback as the Column form)
    if (n < k) {
      var h = 0L
      var i = 0
      while (i < n) { h = (h * B + cp(i)) % P; i += 1 }
      return h
    }
    val w = pow(k)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + cp(i)) % P; i += 1 }
    var min = h
    while (i < n) {
      // remove cp(i-k), shift, add cp(i) — all mod P (kept non-negative)
      h = (h - (cp(i - k) * w) % P + P) % P
      h = (h * B + cp(i)) % P
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Column API: `minGramHash64($"text", 8)`. */
  def minGramHash64(c: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(MinGramHash64(ColumnBridge.expression(c), k))
  }
}
