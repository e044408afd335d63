package graft

import org.apache.spark.sql.functions._
import graft.functions.CappedSortedLongs

/** The capped sorted-list aggregate behind Quantiles' one-job
  * small-group fast path: completeness is exactly `count ≤ cap`, the
  * buffer never holds more than cap values, merge order can't matter
  * (total sort at eval), and nulls don't count. */
class CappedSortedLongsSpec extends SparkSpec {
  import spark.implicits._

  private def agg(df: org.apache.spark.sql.DataFrame, cap: Int) =
    df.groupBy("g").agg(
      CappedSortedLongs.cappedSortedLongs(col("v"), cap).as("vs"),
      count(col("v")).as("n"))

  test("small group yields the complete sorted list; big group yields NULL") {
    val df = (Seq.fill(3)(("small", 7L)) ++ Seq(("small", 2L), ("small", 9L)) ++
      (1L to 40L).map(i => ("big", i))).toDF("g", "v")
    val out = agg(df, cap = 10).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(out("small") == Seq(2L, 7L, 7L, 7L, 9L)) // duplicates kept, sorted
    assert(out("big") == null) // 40 > cap: overflow marker
  }

  test("exact cap boundary: count == cap is complete, cap+1 is not") {
    val df = ((1L to 16L).map(i => ("at", i)) ++
      (1L to 17L).map(i => ("over", i))).toDF("g", "v")
    val out = agg(df, cap = 16).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(out("at") == (1L to 16L))
    assert(out("over") == null)
  }

  test("nulls are skipped, not counted against the cap") {
    val df = Seq(("g", Some(3L)), ("g", None), ("g", Some(1L)), ("g", None))
      .toDF("g", "v")
    val out = agg(df, cap = 2).collect().head
    assert(out.getSeq[Long](1) == Seq(1L, 3L)) // 2 non-null == cap: complete
    assert(out.getLong(2) == 2L)
    // an all-null group is complete and empty, not NULL
    val allNull = Seq(("g", Option.empty[Long])).toDF("g", "v")
    assert(agg(allNull, cap = 2).collect().head.getSeq[Long](1) == Seq.empty)
  }

  test("result is repartition-invariant (partial buffers merge under the cap)") {
    val rng = new scala.util.Random(3)
    val rows = (1 to 500).map(i => (s"g${i % 3}", rng.nextLong() % 1000))
    val one = agg(rows.toDF("g", "v").repartition(1), cap = 300).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    val many = agg(rows.toDF("g", "v").repartition(13), cap = 300).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(one == many)
    // and matches a driver-side sort where complete
    val want = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    one.foreach { case (g, vs) =>
      if (want(g).size <= 300) assert(vs == want(g), g) else assert(vs == null, g)
    }
  }
}
