package graft

import org.apache.spark.sql.functions._
import graft.ops.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "name", "v")

  test("upsert: update matched, insert unmatched, carry untouched") {
    val updates = Seq(
      (2L, "b2", 22.0), // update
      (9L, "i", 90.0) // insert
    ).toDF("k", "name", "v")
    val out = Merge.upsert(target, updates, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, "a", 10.0), (2L, "b2", 22.0), (3L, "c", 30.0), (9L, "i", 90.0)))
  }

  test("an all-NULL staging payload still wins over the target row") {
    val updates = Seq((2L, Option.empty[String], Option.empty[Double]))
      .toDF("k", "name", "v")
    val out = Merge.upsert(target, updates, Seq("k"))
      .filter(col("k") === 2L).first()
    assert(out.isNullAt(1) && out.isNullAt(2))
  }

  test("upsertDelete removes tombstoned keys from either side") {
    val updates = Seq((2L, "b2", 22.0), (9L, "i", 90.0)).toDF("k", "name", "v")
    val tomb = Seq(3L, 9L).toDF("k")
    val out = Merge.upsertDelete(target, updates, Seq("k"), tomb)
      .orderBy("k").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L, 2L))
  }

  test("schema mismatch is rejected up front") {
    val bad = Seq((1L, "x")).toDF("k", "name")
    intercept[IllegalArgumentException] {
      Merge.upsert(target, bad, Seq("k"))
    }
  }

  test("column TYPE mismatch is rejected up front, not silently widened") {
    // same names, but v is string — without the type check the
    // when/otherwise payload pick would widen to a common type
    val bad = Seq((1L, "x", "9.9")).toDF("k", "name", "v")
    val e = intercept[IllegalArgumentException] {
      Merge.upsert(target, bad, Seq("k"))
    }
    assert(e.getMessage.contains("type mismatch"))
  }

  test("upsert is idempotent: re-applying the same batch changes nothing") {
    val updates = Seq((2L, "b2", 22.0), (9L, "i", 90.0)).toDF("k", "name", "v")
    val once = Merge.upsert(target, updates, Seq("k"))
    val twice = Merge.upsert(once, updates, Seq("k"))
    assert(once.orderBy("k").collect().toSeq == twice.orderBy("k").collect().toSeq)
  }
}
