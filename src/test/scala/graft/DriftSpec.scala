package graft

import org.apache.spark.sql.functions._
import graft.ops.Drift

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical slices: tvd = 0, max_gap = 0") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val s = Drift.driftSummary(d, d, "n_chars", 0L, 1023L, 16).head()
    assert(s.getAs[Double]("tvd") == 0.0)
    assert(s.getAs[Double]("max_gap") == 0.0)
    assert(s.getAs[Long]("a_total") == s.getAs[Long]("b_total"))
  }

  test("disjoint masses: tvd = 1") {
    val a = Seq(1L, 2L, 3L).toDF("v")
    val b = Seq(100L, 101L).toDF("v")
    val s = Drift.driftSummary(a, b, "v", 0L, 127L, 8).head()
    assert(s.getAs[Double]("tvd") == 1.0)
  }

  test("bins share one grid; fractions sum to 1 per side") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val a = d.filter(col("doc_id") % 2 === 0)
    val b = d.filter(col("doc_id") % 2 =!= 0)
    val bins = Drift.driftBins(a, b, "n_chars", 0L, 1023L, 16)
      .orderBy("bin").collect()
    assert(bins.length == 16)
    assert(math.abs(bins.map(_.getAs[Double]("a_frac")).sum - 1.0) < 1e-12)
    assert(math.abs(bins.map(_.getAs[Double]("b_frac")).sum - 1.0) < 1e-12)
    // gap is |a_frac − b_frac| per bin
    bins.foreach { r =>
      assert(r.getAs[Double]("gap") ==
        math.abs(r.getAs[Double]("a_frac") - r.getAs[Double]("b_frac")))
    }
    // summary max_gap equals the bins' largest gap; tvd = Σgap/2 (up to
    // the exact-integer vs float-sum formulation)
    val s = Drift.driftSummary(a, b, "n_chars", 0L, 1023L, 16).head()
    assert(s.getAs[Double]("max_gap") == bins.map(_.getAs[Double]("gap")).max)
    assert(math.abs(s.getAs[Double]("tvd") -
      bins.map(_.getAs[Double]("gap")).sum / 2.0) < 1e-9)
  }

  test("auto bounds span the union of both sides") {
    val a = Seq(0L, 10L).toDF("v")
    val b = Seq(90L, 100L).toDF("v")
    val bins = Drift.driftBinsAuto(a, b, "v", 10).collect()
    // no rows dropped: each side's counts total its size
    assert(bins.map(_.getAs[Long]("a_n")).sum == 2L)
    assert(bins.map(_.getAs[Long]("b_n")).sum == 2L)
  }
}
