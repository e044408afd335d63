package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.Transitions

class TransitionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("consecutive pairs per key; probabilities row-normalize") {
    // user 1: a→b→a→c ; user 2: b→a — pairs: (a,b),(b,a)x2,(a,c)
    val e = Seq(
      (1L, ts(1), 1L, "a"), (2L, ts(2), 1L, "b"),
      (3L, ts(3), 1L, "a"), (4L, ts(4), 1L, "c"),
      (5L, ts(1), 2L, "b"), (6L, ts(2), 2L, "a")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val m = Transitions
      .transitionMatrix(e, "user_id", "ts", "event_type", "event_id")
      .orderBy("from_action", "to_action").collect()
    val byPair = m.map(r => (r.getString(0), r.getString(1)) ->
      (r.getAs[Long]("n"), r.getAs[Double]("prob"))).toMap
    assert(byPair(("a", "b")) == ((1L, 0.5)))
    assert(byPair(("a", "c")) == ((1L, 0.5)))
    assert(byPair(("b", "a")) == ((2L, 1.0)))
    assert(m.length == 3)
  }

  test("ties in ts break by the tie column; last events yield no pair") {
    val e = Seq(
      (10L, ts(5), 1L, "x"), (11L, ts(5), 1L, "y"), (12L, ts(5), 1L, "z")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val m = Transitions
      .transitionMatrix(e, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(m == Set(("x", "y"), ("y", "z")))
  }

  test("transitions INTO a null action are counted, not dropped") {
    // a -> NULL -> b : both pairs must exist, and a's probabilities
    // must normalize over BOTH of its outgoing edges
    val e = Seq(
      (1L, ts(1), 1L, Some("a")), (2L, ts(2), 1L, None),
      (3L, ts(3), 1L, Some("b")), (4L, ts(4), 1L, Some("a")),
      (5L, ts(5), 1L, Some("c"))
    ).toDF("event_id", "ts", "user_id", "event_type")
    val m = graft.ops.Transitions
      .transitionMatrix(e, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), Option(r.getString(1))) ->
        (r.getAs[Long]("n"), r.getAs[Double]("prob"))).toMap
    assert(m(("a", None)) == ((1L, 0.5)))
    assert(m(("a", Some("c"))) == ((1L, 0.5)))
    assert(m.keys.exists(k => k._1 == null && k._2.contains("b")))
  }

  test("sessionPaths renders null actions as a visible step") {
    val e = Seq(
      (1L, ts(1), 1L, Some("a")), (2L, ts(2), 1L, None), (3L, ts(3), 1L, Some("b"))
    ).toDF("event_id", "ts", "user_id", "event_type")
    val p = graft.ops.Transitions
      .sessionPaths(e, "user_id", "ts", "event_type", "event_id").collect()
    assert(p.length == 1 && p.head.getString(0) == "a>null>b")
  }

  test("sessionPaths: gap splits sessions; order survives collect_list") {
    // user 1: a,b at t=1,2 then (gap > 30min) c at t=4000; user 2: a,b
    val e = Seq(
      (1L, ts(1), 1L, "a"), (2L, ts(2), 1L, "b"), (3L, ts(4000), 1L, "c"),
      (4L, ts(10), 2L, "a"), (5L, ts(11), 2L, "b")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val p = graft.ops.Transitions
      .sessionPaths(e, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_sessions")).toMap
    assert(p == Map("a>b" -> 2L, "c" -> 1L))
  }

  test("sessionPaths: ts ties order by the tie column inside the path") {
    val e = Seq(
      (3L, ts(5), 1L, "z"), (1L, ts(5), 1L, "x"), (2L, ts(5), 1L, "y")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val p = graft.ops.Transitions
      .sessionPaths(e, "user_id", "ts", "event_type", "event_id")
      .collect()
    assert(p.length == 1 && p.head.getString(0) == "x>y>z")
  }

  test("null keys are dropped; per-from probabilities sum to 1") {
    val e = Seq(
      (1L, ts(1), Some(1L), "a"), (2L, ts(2), Some(1L), "b"),
      (3L, ts(1), None, "a"), (4L, ts(2), None, "b")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val m = Transitions
      .transitionMatrix(e, "user_id", "ts", "event_type", "event_id")
    assert(m.count() == 1L) // only user 1's single pair
    val fixture = spark.read.parquet(s"$sf/events.parquet")
    val sums = Transitions
      .transitionMatrix(fixture, "user_id", "ts", "event_type", "event_id")
      .groupBy("from_action").agg(sum("prob").as("p")).collect()
    sums.foreach(r => assert(math.abs(r.getAs[Double]("p") - 1.0) < 1e-12))
  }
}
