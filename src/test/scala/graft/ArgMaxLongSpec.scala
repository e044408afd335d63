package graft

import org.apache.spark.sql.functions._
import graft.functions.ArgMaxLong

/** ArgMaxLong vs the max(struct(ord, value)) spelling it replaces: the
  * two must agree on every group — including ord ties (larger value
  * wins), null rows (skipped), all-null groups (NULL result), and the
  * Long.MinValue sentinel band assignCells uses for null cosines. The
  * point of the aggregate is plan shape (primitive buffer → whole-stage
  * HashAggregate instead of SortAggregate's hidden map-side sort), so
  * the spec also pins the physical plan. */
class ArgMaxLongSpec extends SparkSpec {
  import spark.implicits._

  private def both(rows: Seq[(Long, java.lang.Long, java.lang.Long)])
      : (Map[Long, Option[Long]], Map[Long, Option[Long]]) = {
    val df = rows.toDF("g", "ord", "v")
    val fast = df.groupBy("g")
      .agg(ArgMaxLong.argmaxLong(col("ord"), col("v")).as("best"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val ref = df.filter(col("ord").isNotNull && col("v").isNotNull)
      .groupBy("g")
      .agg(max(struct(col("ord"), col("v"))).as("b"))
      .collect().map(r => r.getLong(0) ->
        Some(r.getStruct(1).getLong(1))).toMap
    // groups absent from ref (all rows null) must be None in fast
    (fast, rows.map(_._1).distinct.map(g => g -> ref.getOrElse(g, None)).toMap)
  }

  test("agrees with max(struct) on ties, negatives, MinValue band, nulls") {
    val rows: Seq[(Long, java.lang.Long, java.lang.Long)] = Seq(
      (1L, 5L, 10L), (1L, 5L, 20L), (1L, 4L, 99L),          // tie -> larger v
      (2L, -7L, 1L), (2L, Long.MinValue, 2L),               // sentinel loses
      (3L, Long.MinValue, 4L), (3L, Long.MinValue, 9L),     // all-sentinel: max v
      (4L, null, 5L), (4L, 3L, null), (4L, 1L, 7L),         // nulls skipped
      (5L, null, 1L), (5L, 2L, null),                       // all invalid -> NULL
      (6L, Long.MaxValue, Long.MinValue))
    val (fast, ref) = both(rows)
    assert(fast == ref, s"fast=$fast ref=$ref")
    assert(fast(1L).contains(20L) && fast(2L).contains(1L) &&
      fast(3L).contains(9L) && fast(4L).contains(7L) && fast(5L).isEmpty)
  }

  test("randomized agreement with the struct-max oracle") {
    val rng = new scala.util.Random(77)
    val rows: Seq[(Long, java.lang.Long, java.lang.Long)] =
      (1 to 4000).map { _ =>
        val g = rng.nextInt(40).toLong
        // small ord domain to force plenty of ties
        val ord: java.lang.Long =
          if (rng.nextInt(20) == 0) null else Long.box(rng.nextInt(8).toLong - 3)
        val v: java.lang.Long =
          if (rng.nextInt(30) == 0) null else Long.box(rng.nextLong() % 1000)
        (g, ord, v)
      }
    val (fast, ref) = both(rows)
    assert(fast == ref)
  }

  test("plans as HashAggregate (primitive buffer), not SortAggregate") {
    val df = (1L to 1000L).map(i => (i % 7, i, i * 3)).toDF("g", "ord", "v")
      .groupBy("g").agg(ArgMaxLong.argmaxLong(col("ord"), col("v")))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"),
      s"argmax_long must hash-aggregate, got:\n$plan")
    assert(!plan.contains("SortAggregate"),
      s"SortAggregate fallback defeats the aggregate's purpose:\n$plan")
  }

  test("SQL registration: argmax_long matches the Column form") {
    graft.GraftExtensions.register(spark)
    Seq((1L, 3L, 30L), (1L, 3L, 40L), (1L, 2L, 99L)).toDF("g", "ord", "v")
      .createOrReplaceTempView("amx")
    assert(spark.sql("SELECT argmax_long(ord, v) FROM amx GROUP BY g")
      .first().getLong(0) == 40L)
  }
}
