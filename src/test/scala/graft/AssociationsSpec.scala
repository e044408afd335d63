package graft

import java.sql.Timestamp
import graft.ops.Associations

/** Session-basket co-occurrence: hand-computed supports and lifts on a
  * tiny fixture, gap-boundary behavior, and the distinct-items
  * contract (repeats inside a session count once). */
class AssociationsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("hand-computed pair supports and lifts across three sessions") {
    // user 1, session 1: A,B,A (A repeats -> counts once); session 2
    // (>30 min later): A alone; user 2, one session: B,C
    val events = Seq(
      (1L, 1L, ts(0), "A"), (2L, 1L, ts(5), "B"), (3L, 1L, ts(10), "A"),
      (4L, 1L, ts(50), "A"),
      (5L, 2L, ts(0), "B"), (6L, 2L, ts(1), "C"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val r = Associations.sessionCooccurrence(events, "user_id", "ts",
        "event_id", "event_type")
      .orderBy("item_a", "item_b").collect()
    assert(r.length == 2)
    val ab = r(0)
    assert((ab.getAs[String]("item_a"), ab.getAs[String]("item_b")) == ("A", "B"))
    assert(ab.getAs[Long]("n_ab") == 1L && ab.getAs[Long]("n_a") == 2L
      && ab.getAs[Long]("n_b") == 2L && ab.getAs[Long]("n_sessions") == 3L)
    assert(ab.getAs[Double]("support") == 1.0 / 3)
    assert(ab.getAs[Double]("conf_ab") == 0.5 && ab.getAs[Double]("conf_ba") == 0.5)
    assert(ab.getAs[Double]("lift") == 3.0 / 4)
    val bc = r(1)
    assert((bc.getAs[String]("item_a"), bc.getAs[String]("item_b")) == ("B", "C"))
    assert(bc.getAs[Double]("lift") == 1.5) // 1*3/(2*1)
  }

  test("events exactly at the gap stay in one session; past it they split") {
    val gap = 60L // seconds
    val base = Seq((1L, 1L, ts(0), "A"), (2L, 1L, ts(1), "B")) // 60s apart
    val joined = Associations.sessionCooccurrence(base.toDF(
        "event_id", "user_id", "ts", "event_type"),
      "user_id", "ts", "event_id", "event_type", gapSeconds = gap)
    assert(joined.count() == 1) // gap == 60s is NOT "> gap": same session
    val split = Associations.sessionCooccurrence(base.toDF(
        "event_id", "user_id", "ts", "event_type"),
      "user_id", "ts", "event_id", "event_type", gapSeconds = 59L)
    assert(split.count() == 0) // 60s > 59s gap: sessions split, no pair
  }

  test("minPairSessions prunes below-threshold pairs") {
    val events = Seq(
      (1L, 1L, ts(0), "A"), (2L, 1L, ts(1), "B"),
      (3L, 2L, ts(0), "A"), (4L, 2L, ts(1), "B"),
      (5L, 3L, ts(0), "A"), (6L, 3L, ts(1), "C"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val all = Associations.sessionCooccurrence(events, "user_id", "ts",
      "event_id", "event_type")
    assert(all.count() == 2) // (A,B) x2 sessions, (A,C) x1
    val pruned = Associations.sessionCooccurrence(events, "user_id", "ts",
      "event_id", "event_type", minPairSessions = 2L)
    val rows = pruned.collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("n_ab") == 2L)
  }

  test("maxBasket guards the quadratic fanout loudly") {
    // one session with 5 distinct items: fine at the cap, loud past it
    val events = (1 to 5).map(i =>
      (i.toLong, 1L, ts(i), s"item_$i"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val ok = Associations.sessionCooccurrence(events, "user_id", "ts",
      "event_id", "event_type", maxBasket = 5)
    assert(ok.count() == 5L * 4 / 2) // all pairs of 5 items
    val over = Associations.sessionCooccurrence(events, "user_id", "ts",
      "event_id", "event_type", maxBasket = 4)
    val e = intercept[Exception] { over.count() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("maxBasket")),
      s"expected the maxBasket raise_error, got: ${msgs(e).mkString(" | ")}")
  }
}
