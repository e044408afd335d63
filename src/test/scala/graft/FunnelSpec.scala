package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.{Cohort, Funnel}

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def tiny = Seq(
    // u1 completes the whole funnel in order
    (1L, "view", ts("2024-01-01 10:00:00")),
    (1L, "click", ts("2024-01-01 10:05:00")),
    (1L, "purchase", ts("2024-01-01 10:10:00")),
    // u2 clicks BEFORE viewing — click must not count
    (2L, "click", ts("2024-01-02 09:00:00")),
    (2L, "view", ts("2024-01-02 10:00:00")),
    // u3 views only
    (3L, "view", ts("2024-01-03 08:00:00")),
    // u4 never views — not in the funnel at all
    (4L, "purchase", ts("2024-01-04 08:00:00"))
  ).toDF("user_id", "event_type", "ts")

  test("funnel ordering is enforced per user") {
    val t = Funnel.funnelTimes(tiny, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .orderBy("user_id").collect()
    assert(t.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val u1 = t(0)
    assert(u1.getTimestamp(1) == ts("2024-01-01 10:00:00"))
    assert(u1.getTimestamp(2) == ts("2024-01-01 10:05:00"))
    assert(u1.getTimestamp(3) == ts("2024-01-01 10:10:00"))
    val u2 = t(1) // pre-view click ignored
    assert(u2.getTimestamp(1) == ts("2024-01-02 10:00:00"))
    assert(u2.isNullAt(2) && u2.isNullAt(3))
    assert(t(2).isNullAt(2) && t(2).isNullAt(3))
  }

  test("equal-time later step does not count (strict after)") {
    val df = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:00:00"))).toDF("user_id", "event_type", "ts")
    val t = Funnel.funnelTimes(df, "user_id", "event_type", "ts",
      Seq("view", "click")).first()
    assert(t.isNullAt(2))
  }

  test("summary counts narrow monotonically on the fixture") {
    val events = graft.streaming.EventStreams.normalizeTs(
      spark.read.parquet(s"$sf/events.parquet"))
    val s = Funnel.funnelSummary(events, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase")).orderBy("stage")
      .collect().map(_.getAs[Long]("n_users"))
    assert(s.length == 3)
    assert(s(0) >= s(1) && s(1) >= s(2))
    assert(s(0) > 0)
  }

  test("cohort retention: offset 0 counts every cohort member once") {
    val events = graft.streaming.EventStreams.normalizeTs(
      spark.read.parquet(s"$sf/events.parquet"))
    val r = Cohort.retention(events, "user_id", "ts")
    val day0 = r.filter(col("day_offset") === 0)
      .agg(sum("n_users")).first().getLong(0)
    val users = events.select("user_id").distinct().count()
    assert(day0 == users)
    // no negative offsets, nothing counted beyond the observed span
    assert(r.filter(col("day_offset") < 0).count() == 0)
  }
}
