package graft

import org.apache.spark.sql.functions.{col, levenshtein, lit}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.BandedLevenshtein

class BandedLevenshteinSpec extends SparkSpec {
  import spark.implicits._

  private def ref(a: String, b: String): Int = {
    // full-table reference DP (code points), independent of both impls
    val x = a.codePoints.toArray
    val y = b.codePoints.toArray
    val dp = Array.tabulate(x.length + 1)(i => Array.tabulate(y.length + 1) {
      j => if (i == 0) j else if (j == 0) i else 0
    })
    for (i <- 1 to x.length; j <- 1 to y.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
    dp(x.length)(y.length)
  }

  private def banded(a: String, b: String, k: Int): Int =
    BandedLevenshtein.compute(
      UTF8String.fromString(a), UTF8String.fromString(b), k)

  test("exact within the band, saturated at maxDist+1 beyond it") {
    val cases = Seq(
      ("", "", 2), ("", "abc", 2), ("abc", "", 3), ("abc", "abc", 0),
      ("abc", "abd", 0), ("abc", "abd", 1), ("kitten", "sitting", 3),
      ("kitten", "sitting", 2), ("ab", "ba", 1), ("ab", "ba", 2),
      ("café", "cafe", 1), ("日本語", "日本誤", 1), ("aaaa", "bbbb", 2))
    cases.foreach { case (a, b, k) =>
      val d = ref(a, b)
      val expected = if (d <= k) d else k + 1
      assert(banded(a, b, k) === expected, s"($a, $b, k=$k) ref=$d")
    }
  }

  test("property: agrees with the reference DP under saturation") {
    val gen = for {
      // 3-letter alphabet keeps distances small enough to straddle the
      // band on both sides; varied lengths exercise the |n-m| short-out
      la <- Gen.choose(0, 14)
      lb <- Gen.choose(0, 14)
      a <- Gen.stringOfN(la, Gen.oneOf('a', 'b', 'c'))
      b <- Gen.oneOf(Gen.const(a), Gen.stringOfN(lb, Gen.oneOf('a', 'b', 'c')))
      k <- Gen.choose(0, 5)
    } yield (a, b, k)
    val prop = Prop.forAll(gen) { case (a, b, k) =>
      val d = ref(a, b)
      banded(a, b, k) == (if (d <= k) d else k + 1)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("matches Spark's levenshtein on the filter-survivor set") {
    // the exact contract the linkage verify relies on: filtering
    // banded <= k keeps the same rows with the same distances as
    // filtering the built-in
    val pairs = Seq(
      ("SUPPLIER-0042 north", "SUPPLIER-0042 nrth"),
      ("SUPPLIER-0042 north", "SUPPLIER-9999 south"),
      ("alpha beta", "alpha beta"),
      ("alpha beta", "alphq betq"),
      ("short", "sort"), ("short", "longer string here"))
      .toDF("a", "b")
    val both = pairs.select(
      levenshtein(col("a"), col("b")).as("full"),
      BandedLevenshtein.bandedLevenshtein(col("a"), col("b"), 2).as("band"))
      .collect()
    both.foreach { r =>
      val (full, band) = (r.getInt(0), r.getInt(1))
      if (full <= 2) assert(band === full) else assert(band === 3)
    }
  }

  test("codegen and interpreted paths agree") {
    val df = Seq(("kitten", "sitting"), ("abc", "abc"), ("", "xy"))
      .toDF("a", "b")
    val viaPlan = df.select(BandedLevenshtein
      .bandedLevenshtein(col("a"), col("b"), 3).as("d"))
      .collect().map(_.getInt(0)).toSeq
    val direct = Seq(("kitten", "sitting"), ("abc", "abc"), ("", "xy"))
      .map { case (a, b) => banded(a, b, 3) }
    assert(viaPlan === direct)
  }
}
