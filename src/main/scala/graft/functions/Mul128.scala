package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DecimalType, LongType}

/** Exact 128-bit integer PRODUCT primitives — the multiplication
  * companion to [[Sum128]] (r13 landed the sum; the per-row decimal
  * MULTIPLY remained the documented open cost).
  *
  * WHY: a Spark decimal multiply whose result precision exceeds 18
  * digits runs on serialized BigDecimals — per row: deserialize both
  * sides, BigDecimal.multiply, precision-check, reserialize. For
  * long-origin inputs (counts, totals) the entire product fits 128 bits
  * by construction (|a·b| < 2¹²⁶ < 10³⁸ for ANY two longs), so the work
  * collapses to `Math.multiplyHigh` + one mul — branch-free primitive
  * long ops inside whole-stage codegen, converting to the declared
  * DECIMAL(38,0) once at the end.
  *
  * Two layers:
  *   - [[Mul128]]: the reusable `BIGINT × BIGINT → DECIMAL(38,0)` exact
  *     product (never overflows its result type — closed by the bound
  *     above). Drop-in for `a.cast(dec38) * b.cast(dec38)` wherever both
  *     operands are longs: the drift TVD numerators and the t-closeness
  *     rational ride it.
  *   - [[Mul128.Arith]]: package-private 128-bit helper arithmetic
  *     (unsigned 64×64→128, 128×64 with loud overflow, 128+128, exact
  *     128÷64 floor division) shared by fused rational expressions like
  *     [[Bm25WeightQ]], where even the one-Decimal-per-row output is
  *     avoidable because the final value is a BIGINT quotient.
  */
case class Mul128(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DecimalType(38, 0)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"mul128 expects (BIGINT, BIGINT), got " +
          s"(${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Mul128.toDecimal(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Mul128.toDecimal($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Mul128 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "mul128"
}

object Mul128 {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Exact `a · b` of two BIGINT columns as DECIMAL(38,0). */
  def mul128(a: Column, b: Column): Column =
    ColumnBridge.column(
      Mul128(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  private val TwoTo64 = java.math.BigDecimal.valueOf(2).pow(64)

  /** Shared by interpreted eval and generated code — keep public.
    * Signed exact product of any two longs (|result| < 2¹²⁶ always fits
    * DECIMAL(38,0), so this cannot fail). */
  def toDecimal(a: Long, b: Long): org.apache.spark.sql.types.Decimal = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // value = hi·2⁶⁴ + unsigned(lo) — the Int128ToDecimal convention
    val loU =
      if (lo >= 0) java.math.BigDecimal.valueOf(lo)
      else java.math.BigDecimal.valueOf(lo).add(TwoTo64)
    val v = java.math.BigDecimal.valueOf(hi).multiply(TwoTo64).add(loU)
    org.apache.spark.sql.types.Decimal(new scala.math.BigDecimal(v), 38, 0)
  }

  /** 128-bit helper arithmetic over NON-NEGATIVE quantities (hi limb
    * always < 2⁶³ — the 10³⁸ < 2¹²⁷ result bound every caller enforces),
    * shared by the fused rational expressions. All methods are `static`
    * shape for codegen. Overflow past the representable bound fails
    * LOUDLY (the bm25/Sum128 contract: never a wrapped value). */
  object Arith {
    private def overflow(what: String): Nothing =
      throw new ArithmeticException(
        s"int128: $what exceeds the 128-bit working range — inputs are " +
          "outside the operator's documented headroom; rescale or shard")

    /** unsigned high 64 of a·b for a with free high bit, b ≥ 0. */
    @inline private def uMulHigh(a: Long, b: Long): Long =
      Math.multiplyHigh(a, b) + (if (a < 0) b else 0L)

    /** (hi, lo) = a · b for longs a, b ≥ 0 — never overflows 128. */
    def mul64(a: Long, b: Long): Array[Long] =
      Array(Math.multiplyHigh(a, b), a * b)

    /** (hi, lo) · c for c ≥ 0, loud past 2¹²⁷. */
    def mul128x64(hi: Long, lo: Long, c: Long): Array[Long] = {
      if (hi != 0 && Math.multiplyHigh(hi, c) != 0) overflow(s"product")
      val hiC = hi * c
      if (hiC < 0) overflow("product")
      val nh = hiC + uMulHigh(lo, c)
      if (nh < 0) overflow("product") // crossed 2¹²⁷: hi limb sign bit
      Array(nh, lo * c)
    }

    /** (aHi, aLo) + (bHi, bLo), loud past 2¹²⁷. */
    def add128(aHi: Long, aLo: Long, bHi: Long, bLo: Long): Array[Long] = {
      val lo = aLo + bLo
      val carry = ((aLo & bLo) | ((aLo | bLo) & ~lo)) >>> 63
      val hi = aHi + bHi + carry
      if (hi < 0) overflow("sum")
      Array(hi, lo)
    }

    /** floor((nHi, nLo) / d) for d > 0, numerator hi limb < 2⁶³.
      * Quotient must fit an unsigned 64 (nHi < d — checked, loud) and is
      * returned as an unsigned-interpreted long. Hacker's Delight
      * divlu-style: two 32-bit digit steps over a normalized divisor —
      * exact, branch-light, no BigInteger on this path. */
    def div128by64(nHi: Long, nLo: Long, d: Long): Long = {
      if (d == 0) overflow("division by zero")
      if (java.lang.Long.compareUnsigned(nHi, d) >= 0) overflow("quotient")
      if (nHi == 0) return java.lang.Long.divideUnsigned(nLo, d)
      val s = java.lang.Long.numberOfLeadingZeros(d)
      val dn = d << s // normalized: top bit set
      val dh = dn >>> 32
      val dl = dn & 0xffffffffL
      val un32 = (nHi << s) | (if (s == 0) 0L else nLo >>> (64 - s))
      val un10 = nLo << s
      val un1 = un10 >>> 32
      val un0 = un10 & 0xffffffffL

      var q1 = java.lang.Long.divideUnsigned(un32, dh)
      var rhat = un32 - q1 * dh
      while (java.lang.Long.compareUnsigned(q1, 0xffffffffL) > 0 ||
          java.lang.Long.compareUnsigned(q1 * dl, (rhat << 32) | un1) > 0) {
        q1 -= 1
        rhat += dh
        if (java.lang.Long.compareUnsigned(rhat, 0x100000000L) >= 0) {
          // rhat overflowed 32 bits: the while-condition can no longer
          // trigger (left side fits 96 bits, right side is now ≥ 2⁹⁶)
          return finishDiv(q1, un32, un1, un0, dh, dl, dn)
        }
      }
      finishDiv(q1, un32, un1, un0, dh, dl, dn)
    }

    private def finishDiv(q1: Long, un32: Long, un1: Long, un0: Long,
                          dh: Long, dl: Long, dn: Long): Long = {
      val un21 = ((un32 << 32) | un1) - q1 * dn
      var q0 = java.lang.Long.divideUnsigned(un21, dh)
      var rhat = un21 - q0 * dh
      var break = false
      while (!break && (java.lang.Long.compareUnsigned(q0, 0xffffffffL) > 0 ||
          java.lang.Long.compareUnsigned(q0 * dl, (rhat << 32) | un0) > 0)) {
        q0 -= 1
        rhat += dh
        if (java.lang.Long.compareUnsigned(rhat, 0x100000000L) >= 0) break = true
      }
      (q1 << 32) | q0
    }

    /** floor((nHi, nLo) / (dHi, dLo)) for a divisor past 64 bits — the
      * RARE branch (a bm25 denominator needs > 1.8·10¹⁹, i.e. corpus
      * token totals near the long bound). Quotient then fits easily;
      * exactness over speed via BigInteger. */
    def div128by128(nHi: Long, nLo: Long, dHi: Long, dLo: Long): Long = {
      def big(hi: Long, lo: Long) =
        java.math.BigInteger.valueOf(hi).shiftLeft(64)
          .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))
      val q = big(nHi, nLo).divide(big(dHi, dLo))
      if (q.bitLength > 63) overflow("quotient")
      q.longValueExact
    }
  }
}
