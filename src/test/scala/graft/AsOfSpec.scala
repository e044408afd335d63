package graft

import java.sql.Timestamp
import graft.ops.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 10:05:00"), 101.0),
    (2L, ts("2024-01-01 10:02:00"), 50.0)
  ).toDF("key", "qt", "price")

  private lazy val trades = Seq(
    (1L, ts("2024-01-01 10:03:00"), "t1"), // between the two quotes
    (1L, ts("2024-01-01 10:05:00"), "t2"), // exactly at quote 2
    (2L, ts("2024-01-01 10:01:00"), "t3"), // before any key-2 quote
    (3L, ts("2024-01-01 10:00:00"), "t4")  // key with no quotes at all
  ).toDF("key", "tt", "trade")

  test("non-strict: latest quote at-or-before each trade") {
    val out = AsOf.asOfJoin(trades, quotes, Seq("key"), "tt", "qt")
      .select("trade", "asof_price").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("t1").contains(100.0))
    assert(out("t2").contains(101.0)) // equal time included
    assert(out("t3").isEmpty)
    assert(out("t4").isEmpty)
  }

  test("strict: equal-time right row excluded") {
    val out = AsOf.asOfJoin(trades, quotes, Seq("key"), "tt", "qt", strict = true)
      .select("trade", "asof_price").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("t2").contains(100.0)) // falls back to the earlier quote
  }

  test("a null payload field travels with its matched row (no field mixing)") {
    // the matched (latest) quote has a NULL size: ASOF LEFT must return
    // that row's null, NOT reach back to the older row's 7 for size while
    // taking price from the newer row — a combination matching no real row
    val quotesWithNulls = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(100.0), Some(7L)),
      (1L, ts("2024-01-01 10:05:00"), Some(101.0), None),
      (1L, ts("2024-01-01 10:08:00"), None, Some(9L))
    ).toDF("key", "qt", "price", "size")
    val t = Seq((1L, ts("2024-01-01 10:06:00"), "x"),
      (1L, ts("2024-01-01 10:09:00"), "y")).toDF("key", "tt", "trade")
    val out = AsOf.asOfJoin(t, quotesWithNulls, Seq("key"), "tt", "qt")
      .select("trade", "asof_price", "asof_size").collect()
      .map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out("x") == ((Some(101.0), None)),
      "size must be the matched row's null, not an older row's value")
    assert(out("y") == ((None, Some(9L))),
      "price must be the matched row's null, not an older row's value")
  }

  test("empty right side preserves every left row with null payloads") {
    val noQuotes = quotes.filter($"key" === -1L)
    val out = AsOf.asOfJoin(trades, noQuotes, Seq("key"), "tt", "qt")
    assert(out.count() == trades.count())
    assert(out.filter($"asof_price".isNotNull).count() == 0)
  }

  test("left rows and columns are all preserved") {
    val out = AsOf.asOfJoin(trades, quotes, Seq("key"), "tt", "qt")
    assert(out.count() == trades.count())
    assert(Seq("key", "tt", "trade", "asof_qt", "asof_price")
      .forall(out.columns.contains))
  }
}
