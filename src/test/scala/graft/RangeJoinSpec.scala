package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("binnedRangeJoin equals the naive theta join, inclusive bounds") {
    val points = Seq(
      (1L, 10L, ts("2024-01-01 10:30:00")),
      (2L, 10L, ts("2024-01-01 11:00:00")), // exactly at an interval end
      (3L, 10L, ts("2024-01-01 12:00:01")), // just outside
      (4L, 20L, ts("2024-01-01 10:30:00")) // right key, wrong user
    ).toDF("pid", "user_id", "ts")
    val intervals = Seq(
      (100L, 10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (101L, 10L, ts("2024-01-01 11:30:00"), ts("2024-01-01 12:00:00"))
    ).toDF("iid", "user_id", "start_ts", "end_ts")

    val binned = RangeJoin.binnedRangeJoin(points, intervals, Seq("user_id"),
      "ts", "start_ts", "end_ts", binSeconds = 600L)
      .select("pid", "range_iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == Set((1L, 100L), (2L, 100L)))

    // cross-check against the naive inequality join
    val naive = points.join(intervals, Seq("user_id"))
      .filter($"ts" >= $"start_ts" && $"ts" <= $"end_ts")
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive)
  }

  test("overlapJoin equals the naive theta join, exactly once per pair") {
    val e = graft.streaming.EventStreams.normalizeTs(
        spark.read.parquet(s"$sf/events.parquet"))
      .select($"event_id", $"user_id", $"ts".as("start_ts"))
      .withColumn("end_ts", expr("start_ts + INTERVAL 30 MINUTES"))
    def run(bin: Long) = RangeJoin.overlapJoin(e, e, Seq("user_id"),
      "start_ts", "end_ts", "start_ts", "end_ts", bin)
      .filter($"event_id" < $"r_event_id")
      .select("event_id", "r_event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val got = run(1800L)
    // exactly-once: no duplicate pairs even though wide intersections
    // share many bins at a narrow bin width
    val narrow = run(120L)
    assert(got.length == got.toSet.size)
    assert(narrow.length == narrow.toSet.size)
    assert(got.toSet == narrow.toSet)
    // naive theta join via self-join on user
    val r = e.select($"event_id".as("b_id"), $"user_id",
      $"start_ts".as("b_start"), $"end_ts".as("b_end"))
    val want = e.join(r, "user_id")
      .filter($"event_id" < $"b_id" &&
        $"start_ts" <= $"b_end" && $"b_start" <= $"end_ts")
      .select("event_id", "b_id").collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSet
    assert(got.toSet == want)
  }

  test("bin width does not change results, only candidate counts") {
    val e = graft.streaming.EventStreams.normalizeTs(
        spark.read.parquet(s"$sf/events.parquet"))
      .select("event_id", "user_id", "ts")
    val iv = e.withColumnRenamed("event_id", "iid")
      .withColumn("end_ts", expr("ts + INTERVAL 30 MINUTES"))
      .select($"user_id", $"iid", $"ts".as("start_ts"), $"end_ts")
    def run(bin: Long) = RangeJoin.binnedRangeJoin(e, iv, Seq("user_id"),
      "ts", "start_ts", "end_ts", bin)
      .select("event_id", "range_iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(600L) == run(7200L))
  }
}
