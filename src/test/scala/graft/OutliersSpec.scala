package graft

import org.apache.spark.sql.functions._
import graft.ops.Outliers

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  test("flags the planted spike and nothing else") {
    // group g: values 1..9 (med=5, MAD=2) plus a 100.0 spike
    val rows = ((1 to 9).map(i => ("g", i.toDouble)) :+ (("g", 100.0))).toDF("k", "v")
    val out = Outliers.madOutliers(rows, "k", "v", k = 3.0)
    val flagged = out.filter(col("is_outlier")).collect()
    assert(flagged.length == 1)
    assert(flagged.head.getAs[Double]("v") == 100.0)
    // med/mad are exact type-1 selections of data values: n=10 → rank 5
    assert(flagged.head.getAs[Double]("med") == 5.0)
    assert(flagged.head.getAs[Double]("mad") == 2.0)
  }

  test("all-equal group: mad = 0, equal rows unflagged, deviants flag") {
    val rows = Seq(("a", 7.0), ("a", 7.0), ("a", 7.0), ("a", 7.1)).toDF("k", "v")
    val out = Outliers.madOutliers(rows, "k", "v").collect()
    assert(out.count(_.getAs[Boolean]("is_outlier")) == 1)
    assert(out.filter(_.getAs[Boolean]("is_outlier"))
      .head.getAs[Double]("v") == 7.1)
  }

  test("null group key keeps its own statistics; null values never flag") {
    val rows = Seq((Some("a"), Some(1.0)), (Some("a"), Some(2.0)),
      (Some("a"), Some(3.0)), (Some("a"), None),
      (None, Some(5.0)), (None, Some(6.0)), (None, Some(60.0)))
      .toDF("k", "v")
    val out = Outliers.madOutliers(rows, "k", "v")
    assert(out.count() == 7L) // no rows lost to the null-safe joins
    val nullGroup = out.filter(col("k").isNull).collect()
    assert(nullGroup.length == 3)
    assert(nullGroup.count(_.getAs[Boolean]("is_outlier")) == 1)
    val nullValue = out.filter(col("v").isNull).collect()
    assert(nullValue.length == 1 && !nullValue.head.getAs[Boolean]("is_outlier"))
  }

  test("a group whose values are ALL null keeps its rows (null stats, no flag)") {
    val rows = Seq((Some("a"), Some(1.0)), (Some("a"), Some(2.0)),
      (Some("b"), Option.empty[Double]), (Some("b"), Option.empty[Double]))
      .toDF("k", "v")
    val out = Outliers.madOutliers(rows, "k", "v")
    assert(out.count() == 4L) // nothing vanishes through the stats joins
    val b = out.filter(col("k") === "b").collect()
    assert(b.length == 2)
    b.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("med")) && r.isNullAt(r.fieldIndex("mad")))
      assert(!r.getAs[Boolean]("is_outlier"))
    }
  }

  test("fixture sanity: outlier set matches a driver-side recompute") {
    val e = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("event_type"), col("value"))
    val got = Outliers.madOutliers(e, "event_type", "value")
      .filter(col("is_outlier")).select("event_id").as[Long].collect().toSet
    // driver-side oracle: same type-1 rank definition
    val byType = e.collect().map(r => (r.getString(1), r.getLong(0), r.getDouble(2)))
      .groupBy(_._1)
    val want = byType.flatMap { case (_, rows) =>
      val vs = rows.map(_._3).sorted
      val med = vs(math.max(1, math.ceil(vs.length * 0.5).toInt) - 1)
      val devs = rows.map(r => math.abs(r._3 - med)).sorted
      val mad = devs(math.max(1, math.ceil(devs.length * 0.5).toInt) - 1)
      rows.filter(r => math.abs(r._3 - med) > 3.0 * mad).map(_._2).toSeq
    }.toSet
    assert(got == want)
  }
}
