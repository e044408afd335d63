package graft

import org.apache.spark.sql.functions._
import graft.ops.Stats

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("perfect line: corr 1, exact slope and intercept") {
    val df = Seq(("g", 1.0, 2.5), ("g", 2.0, 4.5), ("g", 3.0, 6.5))
      .toDF("k", "x", "y")
    val r = Stats.groupedCorrSlope(df, Seq("k"), "x", "y").head()
    assert(r.getAs[Long]("n") == 3L)
    // corr is DETERMINISTIC, not algebraically 1: sqrt(a)·sqrt(b) rounds
    assert(math.abs(r.getAs[Double]("corr") - 1.0) < 1e-12)
    assert(r.getAs[Double]("slope") == 2.0)
    assert(math.abs(r.getAs[Double]("intercept") - 0.5) < 1e-12)
  }

  test("exact-64-bit moment domain: $20M-class values compute, past " +
    "~$30M the error is loud (division-identity check, never a wrap)") {
    // the r13 review scenario: $20M-class values at scale=100 put
    // per-row squares past a conservative 4e18 double guard — the exact
    // check accepts everything the 64-bit lane can express (< 2^63)
    val money = Seq(("g", 1.0e7, 0.5e7), ("g", 2.0e7, 1.0e7),
      ("g", 3.0e7, 1.5e7)).toDF("k", "x", "y") // x^2 up to 9e18 < 2^63
    val r = Stats.groupedCorrSlope(money, Seq("k"), "x", "y").head()
    assert(r.getAs[Long]("n") == 3L)
    assert(math.abs(r.getAs[Double]("corr") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("slope") - 0.5) < 1e-9)
    // past the 64-bit product range: loud, named error — not a wrapped
    // long and not an opaque decimal failure
    val over = Seq(("g", 4.0e7, 1.0)).toDF("k", "x", "y") // x^2 = 1.6e19
    val e = intercept[Exception] {
      Stats.groupedCorrSlope(over, Seq("k"), "x", "y").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("Stats:") && m.contains("2^63")),
      s"expected the loud domain error, got: ${msgs(e).mkString(" | ")}")
  }

  test("degenerate variance yields NULL statistics, not NaN") {
    val constX = Seq(("g", 5.0, 1.0), ("g", 5.0, 2.0)).toDF("k", "x", "y")
    val r = Stats.groupedCorrSlope(constX, Seq("k"), "x", "y").head()
    assert(r.isNullAt(r.fieldIndex("corr")))
    assert(r.isNullAt(r.fieldIndex("slope")))
    assert(r.isNullAt(r.fieldIndex("intercept")))
  }

  test("null pairs are excluded; groups are independent") {
    val df = Seq(
      (Some("a"), Some(1.0), Some(1.0)), (Some("a"), Some(2.0), Some(3.0)),
      (Some("a"), None, Some(9.0)), (Some("b"), Some(1.0), Some(5.0)),
      (Some("b"), Some(3.0), Some(1.0))).toDF("k", "x", "y")
    val r = Stats.groupedCorrSlope(df, Seq("k"), "x", "y")
      .collect().map(row => row.getString(0) -> row).toMap
    assert(r("a").getAs[Long]("n") == 2L)
    assert(math.abs(r("a").getAs[Double]("corr") - 1.0) < 1e-12)
    assert(math.abs(r("b").getAs[Double]("corr") + 1.0) < 1e-12)
    assert(r("b").getAs[Double]("slope") == -2.0)
  }

  test("NaN/Infinity rows leave n AND the sums together") {
    val clean = Seq(("g", 1.0, 2.0), ("g", 2.0, 4.0), ("g", 3.0, 6.0))
    val dirty = clean ++ Seq(("g", Double.NaN, 1.0),
      ("g", 5.0, Double.PositiveInfinity))
    val a = Stats.groupedCorrSlope(clean.toDF("k", "x", "y"), Seq("k"), "x", "y")
      .head()
    val b = Stats.groupedCorrSlope(dirty.toDF("k", "x", "y"), Seq("k"), "x", "y")
      .head()
    // non-finite rows are fully excluded: identical n AND statistics
    assert(b.getAs[Long]("n") == 3L)
    assert(b.getAs[Double]("corr") == a.getAs[Double]("corr"))
    assert(b.getAs[Double]("slope") == a.getAs[Double]("slope"))
  }

  test("agrees with Spark's float corr within float-accumulation error") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val exact = Stats.groupedCorrSlope(li, Seq("l_returnflag"),
        "l_quantity", "l_extendedprice").collect()
      .map(row => row.getString(0) -> row.getAs[Double]("corr")).toMap
    val approx = li.groupBy("l_returnflag")
      .agg(corr("l_quantity", "l_extendedprice").as("c")).collect()
      .map(row => row.getString(0) -> row.getAs[Double]("c")).toMap
    exact.foreach { case (k, v) =>
      assert(math.abs(v - approx(k)) < 1e-9, s"group $k")
    }
  }

  test("result is invariant under repartitioning (the claim float corr can't make)") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    def run(d: org.apache.spark.sql.DataFrame) =
      Stats.groupedCorrSlope(d, Seq("l_returnflag"),
          "l_quantity", "l_extendedprice")
        .collect().map(r => (r.getString(0), r.getAs[Double]("corr"),
          r.getAs[Double]("slope"), r.getAs[Double]("intercept"))).sortBy(_._1)
    assert(run(li).toSeq == run(li.repartition(13)).toSeq)
  }

  test("welchTwoSample: hand-computed means, variances, and t on one group") {
    // A = [1, 2, 3] (var 1), B = [2, 4] (var 2)
    val df = Seq(("g", 0, 1.0), ("g", 0, 2.0), ("g", 0, 3.0),
      ("g", 1, 2.0), ("g", 1, 4.0)).toDF("k", "variant", "v")
    val r = Stats.welchTwoSample(df, Seq("k"), "variant", "v").collect().head
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("mean_a") == 2.0 && r.getAs[Double]("mean_b") == 3.0)
    assert(r.getAs[Double]("var_a") == 1.0 && r.getAs[Double]("var_b") == 2.0)
    // same fixed IEEE op order as the operator's tree
    val se2 = 1.0 / 3.0 + 2.0 / 2.0
    assert(r.getAs[Double]("t_stat") == (2.0 - 3.0) / math.sqrt(se2))
  }

  test("welchTwoSample: degenerate sides yield NULL pieces, never wrong numbers") {
    val df = Seq(
      ("one_b", 0, 1.0), ("one_b", 0, 2.0), ("one_b", 1, 5.0), // n_b = 1
      ("const", 0, 3.0), ("const", 0, 3.0), ("const", 1, 3.0), ("const", 1, 3.0))
      .toDF("k", "variant", "v")
    val rows = Stats.welchTwoSample(df, Seq("k"), "variant", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("one_b").isNullAt(rows("one_b").fieldIndex("var_b")))
    assert(rows("one_b").isNullAt(rows("one_b").fieldIndex("t_stat")))
    // zero variance on both sides -> se2 = 0 -> NULL t, not Infinity
    assert(rows("const").getAs[Double]("var_a") == 0.0)
    assert(rows("const").isNullAt(rows("const").fieldIndex("t_stat")))
  }

  test("welchTwoSample excludes NULL variants entirely") {
    val df = Seq(("g", Some(0), 1.0), ("g", Some(0), 3.0),
      ("g", Some(1), 2.0), ("g", Some(1), 4.0), ("g", None, 100.0))
      .toDF("k", "variant", "v")
    val r = Stats.welchTwoSample(df, Seq("k"), "variant", "v").collect().head
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("mean_b") == 3.0) // the 100.0 never entered
  }

  test("welchTwoSample drops an all-NULL-variant group — matching the " +
    "oracle's pre-aggregation variant filter") {
    // group "gone" has ONLY null-variant rows: the engine must emit no
    // row for it at all (not a zero-count row), exactly like a SQL
    // replay whose WHERE drops the rows before GROUP BY — the r9 oracle
    // filters user_id IS NOT NULL, equivalent to variant IS NOT NULL
    // under variant = pmod(user_id, 2)
    val df = Seq(("keep", Some(0), 1.0), ("keep", Some(1), 2.0),
      ("gone", None, 5.0), ("gone", None, 7.0)).toDF("k", "variant", "v")
    val out = Stats.welchTwoSample(df, Seq("k"), "variant", "v").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("keep"))
  }

  test("bootstrapMeanCI matches an independent plain-Scala replay") {
    val data = Seq((1L, 10.0), (2L, 12.0), (3L, 9.0), (4L, 30.0), (5L, 11.0),
      (6L, 14.0), (7L, 8.0), (8L, 13.0))
    val b = 50; val alpha = 0.1
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val cdf = Stats.PoissonCdf.map(_.toDouble)
    val means = (1 to b).map { r =>
      var sv = BigInt(0); var sm = 0L
      data.foreach { case (id, v) =>
        val u = (java.lang.Long.parseLong(
          md5hex(s"$id:$r:42").substring(0, 13), 16) + 0.5) / 4503599627370496.0
        val m = cdf.indexWhere(u < _) match { case -1 => 9; case k => k }
        sv += BigInt(math.round(v * 100)) * m; sm += m
      }
      if (sm > 0) (sv.toDouble / sm.toDouble) / 100 else Double.NaN
    }.sorted
    val kLo = math.max(1, (b * alpha / 2).toInt); val kHi = b + 1 - kLo
    val r = Stats.bootstrapMeanCI(data.toDF("id", "v"), "id", "v",
      b = b, alpha = alpha).collect().head
    assert(r.getAs[Long]("n_rows") == 8L)
    assert(r.getAs[Double]("mean") == data.map(_._2).sum / 8)
    assert(r.getAs[Double]("ci_lo") == means(kLo - 1))
    assert(r.getAs[Double]("ci_hi") == means(kHi - 1))
    assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("mean") &&
      r.getAs[Double]("mean") <= r.getAs[Double]("ci_hi"))
  }

  test("bootstrapMeanCI is repartition-invariant") {
    val df = spark.read.parquet(s"$sf/documents.parquet")
    val a = Stats.bootstrapMeanCI(df, "doc_id", "n_chars", b = 40).collect().head
    val c = Stats.bootstrapMeanCI(df.repartition(7), "doc_id", "n_chars", b = 40)
      .collect().head
    assert(a == c)
  }

  test("welchTwoSample is repartition-invariant (exact moments)") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("variant", pmod(col("user_id"), lit(2)))
    def run(d: org.apache.spark.sql.DataFrame) =
      Stats.welchTwoSample(d, Seq("event_type"), "variant", "value")
        .collect().map(r => (r.getString(0), r.getAs[Double]("t_stat")))
        .sortBy(_._1).toSeq
    assert(run(ev) == run(ev.repartition(13)))
  }
}
