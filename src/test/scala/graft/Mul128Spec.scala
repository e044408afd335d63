package graft

import java.math.BigInteger
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.{Bm25WeightQ, Mul128}
import graft.functions.Mul128.Arith

/** 128-bit product/divide primitives vs a BigInteger oracle: the fused
  * bm25 rational and the generic mul128 column must be exact for every
  * representable input and loud past the documented bounds. The
  * arithmetic props are pure JVM (no Spark jobs), so case counts are
  * generous. */
class Mul128Spec extends SparkSpec {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(2000)
    .withInitialSeed(org.scalacheck.rng.Seed(1414L))

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, s"$name failed: ${r.status}")
  }

  private def big(hi: Long, lo: Long): BigInteger =
    BigInteger.valueOf(hi).shiftLeft(64)
      .add(new BigInteger(java.lang.Long.toUnsignedString(lo)))

  // mix magnitudes so digit-boundary paths (q1/q0 adjust loops, rhat
  // overflow breaks) actually exercise — uniform longs rarely hit them
  private val nonNeg: Gen[Long] = Gen.oneOf(
    Gen.chooseNum(0L, Long.MaxValue),
    Gen.chooseNum(0L, 0xffffffffL),
    Gen.chooseNum(0L, 1000L),
    Gen.oneOf(0L, 1L, 2L, 0xffffffffL, 0x100000000L, Long.MaxValue,
      Long.MaxValue - 1))

  private val posDiv: Gen[Long] = nonNeg.map(x => if (x <= 0) 1L else x)

  test("mul64 / mul128x64 / add128 match BigInteger inside 2^127") {
    check("mul-chain", Prop.forAll(nonNeg, nonNeg, nonNeg) {
      (a: Long, b: Long, c: Long) =>
        val m = Arith.mul64(a, b)
        val mOk = big(m(0), m(1)) ==
          BigInteger.valueOf(a).multiply(BigInteger.valueOf(b))
        val expected = BigInteger.valueOf(a).multiply(BigInteger.valueOf(b))
          .multiply(BigInteger.valueOf(c))
        val chainOk =
          if (expected.bitLength <= 127) {
            val m2 = Arith.mul128x64(m(0), m(1), c)
            val sumExpect = big(m(0), m(1)).add(expected)
            val sumOk =
              if (sumExpect.bitLength <= 127) {
                val s = Arith.add128(m(0), m(1), m2(0), m2(1))
                big(s(0), s(1)) == sumExpect
              } else
                try { Arith.add128(m(0), m(1), m2(0), m2(1)); false }
                catch { case _: ArithmeticException => true }
            big(m2(0), m2(1)) == expected && sumOk
          } else
            try { Arith.mul128x64(m(0), m(1), c); false }
            catch { case _: ArithmeticException => true }
        mOk && chainOk
    })
  }

  test("div128by64 matches BigInteger across magnitude mixes") {
    check("div-64", Prop.forAll(nonNeg, nonNeg, posDiv) {
      (a: Long, b: Long, d: Long) =>
        val n = Arith.mul64(a, b)
        val q = big(n(0), n(1)).divide(BigInteger.valueOf(d))
        if (q.bitLength <= 64)
          new BigInteger(java.lang.Long.toUnsignedString(
            Arith.div128by64(n(0), n(1), d))) == q
        else
          try { Arith.div128by64(n(0), n(1), d); false }
          catch { case _: ArithmeticException => true }
    })
  }

  test("div128by64 digit-boundary cases") {
    assert(Arith.div128by64(0L, -1L, 1L) == -1L) // (2^64-1)/1 unsigned
    assert(Arith.div128by64(1L, 0L, 2L) == (1L << 63))
    // floor(2^126 / (2^63-1)) = 2^63 + 1 (2^126 = (2^63-1)(2^63+1) + 1):
    // the quotient's top bit set — unsigned-representation edge
    assert(Arith.div128by64(1L << 62, 0L, Long.MaxValue) == ((1L << 63) | 1L))
    // quotient exactly 2^64 does not fit unsigned 64 — loud
    intercept[ArithmeticException] {
      Arith.div128by64(Long.MaxValue, 0L, Long.MaxValue)
    }
    intercept[ArithmeticException] { Arith.div128by64(1L, 0L, 1L) }
    intercept[ArithmeticException] { Arith.div128by64(0L, 1L, 0L) }
  }

  test("div128by128 matches BigInteger") {
    check("div-128", Prop.forAll(nonNeg, nonNeg, nonNeg, posDiv) {
      (a: Long, b: Long, c: Long, d: Long) =>
        val n = Arith.mul64(a, b)
        val den = Arith.mul64(c, d)
        (den(0) | den(1)) == 0 || {
          val q = big(n(0), n(1)).divide(big(den(0), den(1)))
          q.bitLength > 63 ||
            BigInteger.valueOf(
              Arith.div128by128(n(0), n(1), den(0), den(1))) == q
        }
    })
  }

  test("Bm25WeightQ.compute equals the BigInteger rational") {
    val gen = for {
      tf <- Gen.chooseNum(1L, 100000L)
      df0 <- Gen.chooseNum(1L, 1000000L)
      n <- Gen.chooseNum(1L, 2000000L)
      dl <- Gen.chooseNum(1L, 1000000L)
      t <- Gen.chooseNum(1L, 4000000000L)
    } yield (tf, df0.min(n), dl, n, t) // df ≤ n as in any real corpus
    check("bm25-rational", Prop.forAll(gen) { case (tf, df, dl, n, t) =>
      val bi = (x: Long) => BigInteger.valueOf(x)
      val num = bi(2 * n - 2 * df + 1).multiply(bi(22 * tf)).multiply(bi(t))
        .multiply(bi(1000000000000L))
      val den = bi(2 * df + 1).multiply(
        bi(10 * tf).multiply(bi(t)).add(bi(3 * t))
          .add(bi(9 * dl).multiply(bi(n))))
      val expect = num.divide(den)
      expect.bitLength > 63 ||
        BigInteger.valueOf(Bm25WeightQ.compute(tf, df, dl, n, t)) == expect
    })
  }

  test("mul128 column equals the decimal(38) product (codegen path)") {
    import spark.implicits._
    val df = Seq((123456789012L, 987654321098L), (-5L, 7L), (0L, 9L),
      (Long.MaxValue, Long.MinValue), (Long.MinValue, Long.MinValue))
      .toDF("a", "b").repartition(2)
    val rows = df.select(
      Mul128.mul128(col("a"), col("b")).as("m"),
      (col("a").cast("decimal(38,0)") * col("b").cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("d")).collect()
    rows.foreach(r => assert(r.getDecimal(0) == r.getDecimal(1), r.toString))
  }
}
