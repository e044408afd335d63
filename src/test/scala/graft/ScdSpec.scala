package graft

import org.apache.spark.sql.functions._
import graft.ops.Scd

class ScdSpec extends SparkSpec {

  import spark.implicits._

  private def dim0 = Seq(
    // key, attr_a, attr_b, valid_from, valid_to, is_current
    (1L, "alice", 10.0, "2024-01-01", "9999-12-31", true),
    (2L, "bob", 20.0, "2024-01-01", "9999-12-31", true),
    (3L, "carol", 30.0, "2024-01-01", "9999-12-31", true),
    // closed history for key 1 (must pass through untouched)
    (1L, "alice", 5.0, "2023-01-01", "2024-01-01", false))
    .toDF("k", "name", "bal", "vf", "vt", "cur")
    .select(col("k"), col("name"), col("bal"),
      to_date(col("vf")).as("valid_from"), to_date(col("vt")).as("valid_to"),
      col("cur").as("is_current"))

  private def upd0 = Seq(
    (1L, "alice", 11.0),   // changed bal → close + reopen
    (2L, "bob", 20.0),     // identical → no-op
    (9L, "zoe", 90.0))     // new key → open row
    .toDF("k", "name", "bal")

  private def merged = Scd.scd2Merge(dim0, upd0, Seq("k"),
    Seq("name", "bal"), "2024-06-15")

  test("row classes: changed closes+reopens, unchanged no-ops, new opens, untouched passes") {
    val rows = merged.collect().map(r => (r.getLong(0), r.getString(1),
      r.getDouble(2), r.getDate(3).toString, r.getDate(4).toString,
      r.getBoolean(5))).toSet
    assert(rows == Set(
      (1L, "alice", 5.0, "2023-01-01", "2024-01-01", false),  // history
      (1L, "alice", 10.0, "2024-01-01", "2024-06-15", false), // closed
      (1L, "alice", 11.0, "2024-06-15", "9999-12-31", true),  // reopened
      (2L, "bob", 20.0, "2024-01-01", "9999-12-31", true),    // no-op
      (3L, "carol", 30.0, "2024-01-01", "9999-12-31", true),  // untouched
      (9L, "zoe", 90.0, "2024-06-15", "9999-12-31", true)))   // new
  }

  test("invariants: one open row per live key, no overlapping intervals") {
    val open = merged.filter(col("is_current")).groupBy("k").count().collect()
    assert(open.forall(_.getLong(1) == 1L), "duplicate open rows")
    val overlaps = merged.as("a").join(merged.as("b"),
      col("a.k") === col("b.k") && col("a.valid_from") < col("b.valid_from") &&
        col("b.valid_from") < col("a.valid_to")).count()
    assert(overlaps == 0, "interval overlap within a key")
  }

  test("null-safe change detection: NULL -> NULL is not a change, NULL -> value is") {
    val d = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "name")
      .select(col("k"), col("name"),
        to_date(lit("2024-01-01")).as("valid_from"),
        to_date(lit("9999-12-31")).as("valid_to"), lit(true).as("is_current"))
    val u = Seq((1L, Option.empty[String]), (2L, Option("bo")))
      .toDF("k", "name")
    val out = Scd.scd2Merge(d, u, Seq("k"), Seq("name"), "2024-06-15")
    assert(out.filter(col("k") === 1).count() == 1, "NULL==NULL must be a no-op")
    assert(out.filter(col("k") === 2).count() == 2, "NULL->value must version")
  }

  test("repeated merge with the same batch is idempotent") {
    val once = merged
    val twice = Scd.scd2Merge(once, upd0, Seq("k"), Seq("name", "bal"),
      "2024-07-01")
    // second merge sees every update equal to the now-current attrs → no-op
    assert(twice.count() == once.count())
    assert(twice.filter(col("valid_from") === "2024-07-01").count() == 0)
  }
}
