package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** key A: events at 00, 01, 04 (gap 02-03); key B: single event. */
  private def fixture = Seq(
    ("a", ts("2024-01-01 00:10:00"), 1.00),
    ("a", ts("2024-01-01 00:40:00"), 2.00),
    ("a", ts("2024-01-01 01:05:00"), 4.00),
    ("a", ts("2024-01-01 04:59:00"), 8.00),
    ("b", ts("2024-02-05 12:30:00"), 5.50)
  ).toDF("k", "t", "v")

  test("resampleLocf: dense grid, gap flags, carry-forward") {
    val out = TimeSeries.resampleLocf(fixture, "k", "t", "v", "hour")
      .orderBy("k", "bucket").collect()

    // key a spans 00..04 inclusive = 5 buckets; key b = 1 bucket
    assert(out.length == 6)
    val a = out.filter(_.getString(0) == "a")
    assert(a.map(_.getTimestamp(1)).toSeq ==
      (0 to 4).map(h => ts(f"2024-01-01 $h%02d:00:00")))
    // is_gap
    assert(a.map(_.getInt(2)).toSeq == Seq(0, 0, 1, 1, 0))
    // n_events
    assert(a.map(_.getLong(3)).toSeq == Seq(2L, 1L, 0L, 0L, 1L))
    // bucket_value: 3.00, 4.00, null, null, 8.00
    val bv = a.map(r => Option(r.getDecimal(4)).map(_.doubleValue))
    assert(bv.toSeq == Seq(Some(3.0), Some(4.0), None, None, Some(8.0)))
    // locf carries 4.00 across the 02-03 gap
    val locf = a.map(_.getDecimal(5).doubleValue)
    assert(locf.toSeq == Seq(3.0, 4.0, 4.0, 4.0, 8.0))

    val b = out.filter(_.getString(0) == "b")
    assert(b.length == 1 && b.head.getInt(2) == 0 &&
      b.head.getDecimal(5).doubleValue == 5.5)
  }

  test("resampleLocf: leading bucket is always observed (no null locf)") {
    val out = TimeSeries.resampleLocf(fixture, "k", "t", "v", "hour")
    assert(out.filter(col("locf_value").isNull).count() == 0)
  }

  test("resampleLocf: day step over the events fixture matches a manual spot") {
    val events = graft.streaming.EventStreams.normalizeTs(
      graft.model.Entities.read(spark, sf, "events"))
    val out = TimeSeries.resampleLocf(events, "user_id", "ts", "value", "day")
    // every key's bucket count == span days; no negative gaps
    val bad = out.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        (datediff(max(col("bucket")), min(col("bucket"))) + 1).as("span"))
      .filter(col("n") =!= col("span"))
    assert(bad.count() == 0)
  }

  test("gapSummary: counts and longest run") {
    val out = TimeSeries.gapSummary(fixture, "k", "t", "v", "hour")
      .orderBy("k").collect()
    val a = out(0)
    assert(a.getString(0) == "a" && a.getLong(1) == 5L && a.getLong(2) == 2L)
    assert(a.getLong(5) == 2L) // the 02-03 run
    val b = out(1)
    assert(b.getString(0) == "b" && b.getLong(1) == 1L && b.getLong(2) == 0L &&
      b.getLong(5) == 0L)
  }

  test("gapSummary: split runs are not merged") {
    val df = Seq(
      ("x", ts("2024-01-01 00:00:00"), 1.0),
      ("x", ts("2024-01-01 02:00:00"), 1.0), // gap at 01
      ("x", ts("2024-01-01 06:00:00"), 1.0)  // gap 03,04,05
    ).toDF("k", "t", "v")
    val r = TimeSeries.gapSummary(df, "k", "t", "v", "hour").collect().head
    assert(r.getLong(1) == 7L && r.getLong(2) == 4L && r.getLong(5) == 3L)
  }

  test("gapSummary drops null-timestamp rows like the grid form did " +
    "(ADVICE r16)") {
    // a null ts would truncate to a NULL bucket and inflate n_observed/
    // n_buckets by one; the rejected grid form silently dropped such rows
    // (the scaffold join never attached them), so the lag form must too
    val df = Seq(
      ("a", Option(ts("2024-01-01 00:10:00")), 1.0),
      ("a", Option(ts("2024-01-01 02:40:00")), 2.0),
      ("a", Option.empty[Timestamp], 9.0),
      ("b", Option.empty[Timestamp], 9.0) // key with ONLY null ts: no row
    ).toDF("k", "t", "v")
    val out = TimeSeries.gapSummary(df, "k", "t", "v", "hour")
      .orderBy("k").collect()
    assert(out.length == 1, "all-null key must not report")
    val a = out.head
    assert(a.getString(0) == "a" && a.getLong(1) == 3L && a.getLong(2) == 1L &&
      a.getLong(5) == 1L)
  }

  test("cusum: equals the textbook recursion; flags only the planted shift") {
    // 6 on-target hours (10.0), then a sustained +5 level shift
    val vals = Seq.fill(6)(10.0) ++ Seq.fill(6)(15.0)
    val df = vals.zipWithIndex.map { case (v, i) =>
      ("k", ts(f"2024-01-01 ${i}%02d:00:00"), v)
    }.toDF("k", "t", "v")
    val rows = TimeSeries.cusum(df, "k", "t", "v", "hour",
        target = BigDecimal(10), allowance = BigDecimal(1),
        threshold = BigDecimal(10))
      .orderBy("bucket").collect()
    // textbook recursion driver-side: S+ = max(0, S+ + x - (target+k))
    var s = BigDecimal(0)
    val want = vals.map { v => s = (s + v - 11).max(0); s }
    val got = rows.map(r => BigDecimal(r.getDecimal(r.fieldIndex("cusum_hi"))))
    assert(got.toSeq.map(_.setScale(2)) == want.map(_.setScale(2)))
    // shift accumulates 4/hour past the 11 reference: crosses h=10 at
    // the 3rd shifted hour; nothing flags before the shift
    assert(rows.map(_.getAs[Boolean]("is_drift")).toSeq ==
      Seq.fill(8)(false) ++ Seq.fill(4)(true))
    // downward side stays zero on an upward shift
    assert(rows.forall(r =>
      BigDecimal(r.getDecimal(r.fieldIndex("cusum_lo"))) == BigDecimal(0)))
  }

  test("cusum: drift starting at the FIRST bucket is flagged (virtual C0 = 0)") {
    // every bucket already above reference — all prefix sums positive;
    // without the zero clamp cusum_hi would be understated by C1 forever
    val vals = Seq.fill(6)(15.0)
    val df = vals.zipWithIndex.map { case (v, i) =>
      ("k", ts(f"2024-01-01 ${i}%02d:00:00"), v)
    }.toDF("k", "t", "v")
    val rows = TimeSeries.cusum(df, "k", "t", "v", "hour",
        BigDecimal(10), BigDecimal(1), BigDecimal(10))
      .orderBy("bucket").collect()
    var s = BigDecimal(0)
    val want = vals.map { v => s = (s + v - 11).max(0); s }
    val got = rows.map(r => BigDecimal(r.getDecimal(r.fieldIndex("cusum_hi"))))
    assert(got.toSeq.map(_.setScale(2)) == want.map(_.setScale(2)))
    // 4/hour past the reference crosses h=10 inside the 3rd bucket
    assert(rows.map(_.getAs[Boolean]("is_drift")).toSeq ==
      Seq(false, false, true, true, true, true))
  }

  test("cusum: downward drift trips the low side symmetrically") {
    val vals = Seq.fill(6)(10.0) ++ Seq.fill(6)(5.0)
    val df = vals.zipWithIndex.map { case (v, i) =>
      ("k", ts(f"2024-01-01 ${i}%02d:00:00"), v)
    }.toDF("k", "t", "v")
    val rows = TimeSeries.cusum(df, "k", "t", "v", "hour",
        BigDecimal(10), BigDecimal(1), BigDecimal(10))
      .orderBy("bucket").collect()
    assert(rows.map(_.getAs[Boolean]("is_drift")).toSeq ==
      Seq.fill(8)(false) ++ Seq.fill(4)(true))
    assert(rows.forall(r =>
      BigDecimal(r.getDecimal(r.fieldIndex("cusum_hi"))) == BigDecimal(0)))
  }
}
