package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DataType, LongType}

/** The fused BM25 weight rational as ONE codegen'd primitive-long
  * expression (r14; companion to [[Mul128]] — this is the per-row
  * multiply cost the r13 notes left open):
  * {{{
  *   weight_q = (2N−2df+1) · 22·tf · T · 10¹²
  *              ─────────────────────────────────   (floor division)
  *              (2df+1) · (10·tf·T + 3·T + 9·dl·N)
  * }}}
  * The old form computed both sides in DECIMAL(38,0) — five serialized-
  * BigDecimal multiplies plus a decimal IntegralDivide PER (doc, token)
  * ROW. Every base factor is a long-valued count, so the whole rational
  * runs in [[Mul128.Arith]] 128-bit primitive arithmetic (multiplyHigh /
  * Hacker's-Delight 128÷64) with NO allocation on the common path, and
  * the result is the BIGINT the ranking consumes directly.
  *
  * Overflow contract (tightened from the old NULL-product proof): any
  * intermediate past 2¹²⁷, or a quotient past 2⁶³−1, throws an
  * ArithmeticException instead of silently vanishing the hottest tokens
  * from the top-k — same loud-failure posture, now also covering the
  * quotient range the old BIGINT cast would have nulled silently.
  * Headroom is unchanged in practice: ~10⁹ docs × 10¹² corpus tokens.
  *
  * Inputs are non-null count aggregates by construction; a NULL input
  * reaching this expression is a caller bug and throws. */
case class Bm25WeightQ(tf: Expression, df: Expression, dl: Expression,
                       nDocs: Expression, totToks: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(tf, df, dl, nDocs, totToks)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bm25_weight_q expects five BIGINTs, got " +
          children.map(_.dataType).mkString(", "))

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null))
      throw new IllegalStateException(
        "bm25_weight_q: NULL input — the rational's inputs are count " +
          "aggregates and can only be NULL through a caller bug")
    Bm25WeightQ.compute(vs(0).asInstanceOf[Long], vs(1).asInstanceOf[Long],
      vs(2).asInstanceOf[Long], vs(3).asInstanceOf[Long],
      vs(4).asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val evs = children.map(_.genCode(ctx))
    // `if (false) throw …` is legal Java (the conditional-compilation
    // idiom), so non-nullable children need no special-casing
    val guards = evs.map(e =>
      s"if (${e.isNull}) throw new IllegalStateException(" +
        "\"bm25_weight_q: NULL input - caller bug\");").mkString("\n")
    val childBlocks = evs.map(_.code).reduce(_ + _)
    ev.copy(
      code = childBlocks + code"""
        $guards
        final long ${ev.value} = graft.functions.Bm25WeightQ.compute(
          ${evs(0).value}, ${evs(1).value}, ${evs(2).value},
          ${evs(3).value}, ${evs(4).value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Bm25WeightQ =
    Bm25WeightQ(newChildren(0), newChildren(1), newChildren(2),
      newChildren(3), newChildren(4))

  override def prettyName: String = "bm25_weight_q"
}

object Bm25WeightQ {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  import Mul128.Arith

  def bm25WeightQ(tf: Column, df: Column, dl: Column,
                  nDocs: Column, totToks: Column): Column =
    ColumnBridge.column(Bm25WeightQ(
      ColumnBridge.expression(tf), ColumnBridge.expression(df),
      ColumnBridge.expression(dl), ColumnBridge.expression(nDocs),
      ColumnBridge.expression(totToks)))

  /** Shared by interpreted eval and generated code — keep public. */
  def compute(tf: Long, df: Long, dl: Long, n: Long, t: Long): Long = {
    // small pre-products stay in checked LONG (loud on the absurd)
    val a = Math.addExact(Math.subtractExact(
      Math.multiplyExact(2L, n), Math.multiplyExact(2L, df)), 1L)
    val b = Math.multiplyExact(22L, tf)
    val num0 = Arith.mul64(a, b)
    val num1 = Arith.mul128x64(num0(0), num0(1), t)
    val num = Arith.mul128x64(num1(0), num1(1), 1000000000000L)
    val d1 = Arith.mul64(Math.multiplyExact(10L, tf), t)
    val d2 = Arith.mul64(3L, t)
    val d3 = Arith.mul64(Math.multiplyExact(9L, dl), n)
    val s1 = Arith.add128(d1(0), d1(1), d2(0), d2(1))
    val s2 = Arith.add128(s1(0), s1(1), d3(0), d3(1))
    val c = Math.addExact(Math.multiplyExact(2L, df), 1L)
    val den = Arith.mul128x64(s2(0), s2(1), c)
    val q =
      if (den(0) == 0) Arith.div128by64(num(0), num(1), den(1))
      else Arith.div128by128(num(0), num(1), den(0), den(1))
    if (q < 0) // unsigned quotient crossed 2⁶³ — not BIGINT-representable
      throw new ArithmeticException(
        "bm25_weight_q: quotient exceeds BIGINT — corpus outside the " +
          "~1e9 docs x 1e12 tokens headroom")
    q
  }
}
