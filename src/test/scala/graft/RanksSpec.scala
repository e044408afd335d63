package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Ranks

/** [[Ranks.globalPercentRank]] must be BIT-identical to Spark's own
  * single-partition `percent_rank` window — ties, duplicates, both
  * directions, and the degenerate single-row frame. */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  private def referencePr(df: org.apache.spark.sql.DataFrame, vCol: String,
                          descending: Boolean) = {
    val w = Window.orderBy(if (descending) col(vCol).desc else col(vCol).asc)
    df.withColumn("pr_ref", percent_rank().over(w))
  }

  private def assertMatches(df: org.apache.spark.sql.DataFrame, vCol: String,
                            descending: Boolean): Unit = {
    val got = Ranks.globalPercentRank(df, vCol, descending)
      .select(col("id"), col("percent_rank"))
    val want = referencePr(df, vCol, descending).select(col("id"), col("pr_ref"))
    val diff = got.join(want, "id")
      .filter(col("percent_rank") =!= col("pr_ref"))
    assert(diff.count() === 0, diff.collect().mkString("\n"))
  }

  test("matches window percent_rank on tied + unique values, desc and asc") {
    // heavy ties (x % 7) so tie runs span the range partitioner's
    // boundaries if handled naively
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("v", (col("id") * 37 % 7).cast("double"))
    assertMatches(df, "v", descending = true)
    assertMatches(df, "v", descending = false)
    val uniq = spark.range(0, 500).toDF("id").withColumn("v", col("id") * 1.5)
    assertMatches(uniq, "v", descending = true)
  }

  test("single row ranks 0.0 (window convention), empty frame stays empty") {
    val one = Seq((1L, 9.9)).toDF("id", "v")
    val pr = Ranks.globalPercentRank(one, "v").select("percent_rank").head().getDouble(0)
    assert(pr === 0.0)
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    assert(Ranks.globalPercentRank(empty, "v").count() === 0)
  }

  test("null values rank last under desc, like the window default") {
    val df = Seq((1L, Some(5.0)), (2L, None), (3L, Some(1.0)), (4L, None))
      .toDF("id", "v")
    val got = Ranks.globalPercentRank(df, "v", descending = true)
      .select("id", "percent_rank").as[(Long, Double)].collect().toMap
    val want = referencePr(df, "v", descending = true)
      .select("id", "pr_ref").as[(Long, Double)].collect().toMap
    assert(got === want)
  }

  private def referenceTiers(df: org.apache.spark.sql.DataFrame, vCol: String,
                             descending: Boolean) =
    referencePr(df, vCol, descending)
      .withColumn("tier_ref",
        when(col("pr_ref") <= 0.2, "Gold")
          .when(col("pr_ref") <= 0.5, "Silver")
          .otherwise("Bronze"))

  private def assertTiersMatch(df: org.apache.spark.sql.DataFrame, vCol: String,
                               descending: Boolean): Unit = {
    val got = Ranks.tiersByPercentRank(df, vCol, Seq(0.2, 0.5),
        Seq("Gold", "Silver", "Bronze"), descending)
      .select(col("id"), col("tier"))
    val want = referenceTiers(df, vCol, descending).select(col("id"), col("tier_ref"))
    val diff = got.join(want, "id").filter(col("tier") =!= col("tier_ref"))
    assert(diff.count() === 0, diff.collect().mkString("\n"))
  }

  test("tiersByPercentRank matches window-percent_rank tiering, ties, both directions") {
    val tied = spark.range(0, 1000).toDF("id")
      .withColumn("v", (col("id") * 37 % 7).cast("double"))
    assertTiersMatch(tied, "v", descending = true)
    assertTiersMatch(tied, "v", descending = false)
    val uniq = spark.range(0, 500).toDF("id").withColumn("v", col("id") * 1.5)
    assertTiersMatch(uniq, "v", descending = true)
    assertTiersMatch(uniq, "v", descending = false)
  }

  test("tiersByPercentRank nulls take the null run's own rank band") {
    // desc: nulls rank LAST → Bronze; asc: nulls rank FIRST → Gold —
    // exactly what tiering over the reference window produces
    val df = Seq((1L, Some(5.0)), (2L, None), (3L, Some(1.0)), (4L, None),
      (5L, Some(3.0)), (6L, Some(2.0)), (7L, Some(4.0)), (8L, Some(0.5)),
      (9L, Some(6.0)), (10L, Some(7.0))).toDF("id", "v")
    assertTiersMatch(df, "v", descending = true)
    assertTiersMatch(df, "v", descending = false)
  }

  test("tiersByPercentRank degenerate frames: single row is first band, all-null works") {
    val one = Seq((1L, 9.9)).toDF("id", "v")
    assert(Ranks.tiersByPercentRank(one, "v", Seq(0.2, 0.5),
      Seq("Gold", "Silver", "Bronze")).select("tier").head().getString(0) === "Gold")
    val allNull = Seq((1L, Option.empty[Double]), (2L, None)).toDF("id", "v")
    assertTiersMatch(allNull, "v", descending = true)
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    assert(Ranks.tiersByPercentRank(empty, "v", Seq(0.2, 0.5),
      Seq("Gold", "Silver", "Bronze")).count() === 0)
  }

  test("tiersByPercentRank construction runs zero jobs and passes the plan gate") {
    val sc = spark.sparkContext
    val group = s"tiers-lazy-${System.nanoTime()}"
    sc.setJobGroup(group, "tiersByPercentRank construction", false)
    val df = spark.range(0, 1000).toDF("id").withColumn("v", col("id") * 2.0)
    val out = Ranks.tiersByPercentRank(df, "v", Seq(0.2, 0.5),
      Seq("Gold", "Silver", "Bronze"))
    out.queryExecution.executedPlan
    sc.clearJobGroup()
    Thread.sleep(300)
    assert(sc.statusTracker.getJobIdsForGroup(group).isEmpty,
      "construction must not run jobs")
    assert(PlanGate.violations(out).isEmpty,
      PlanGate.violations(out).mkString(", "))
    assert(out.count() === 1000)
  }

  test("plan passes the plan gate (no single-partition funnel over row data)") {
    // the one-row totals aggregate legitimately uses a single-partition
    // exchange over its global-agg partial (≤ shuffle.partitions compact
    // rows) — PlanGate.violations distinguishes exactly that shape from
    // a row-data funnel, so this must come back empty
    val df = spark.range(0, 1000).toDF("id").withColumn("v", col("id") * 2.0)
    val out = Ranks.globalPercentRank(df, "v")
    assert(PlanGate.violations(out).isEmpty,
      PlanGate.violations(out).mkString(", "))
  }

  test("construction runs zero Spark jobs (lazy in-plan protocol)") {
    val sc = spark.sparkContext
    val group = s"ranks-lazy-${System.nanoTime()}"
    sc.setJobGroup(group, "globalPercentRank construction", false)
    val df = spark.range(0, 1000).toDF("id").withColumn("v", col("id") * 2.0)
    val out = Ranks.globalPercentRank(df, "v") // construction only
    out.queryExecution.executedPlan // force planning too
    sc.clearJobGroup()
    Thread.sleep(300) // status store updates are async
    assert(sc.statusTracker.getJobIdsForGroup(group).isEmpty,
      "construction must not run jobs")
    // sanity: the frame still computes (one action, jobs allowed now)
    assert(out.count() === 1000)
  }

  // ── eager boundary tiering ─────────────────────────────────────────
  private def assertEagerMatch(df: org.apache.spark.sql.DataFrame,
                               vCol: String, descending: Boolean): Unit = {
    val got = Ranks.tiersByPercentRankEager(df, vCol, Seq(0.2, 0.5),
        Seq("Gold", "Silver", "Bronze"), descending)
      .select(col("id"), col("tier"))
    val want = referenceTiers(df, vCol, descending)
      .select(col("id"), col("tier_ref"))
    val diff = got.join(want, "id").filter(col("tier") =!= col("tier_ref"))
    assert(diff.count() === 0, diff.collect().mkString("\n"))
  }

  test("tiersByPercentRankEager matches window tiering: ties, nulls, " +
    "both directions, double/long/decimal types") {
    val tied = spark.range(0, 1000).toDF("id")
      .withColumn("v", (col("id") * 37 % 7).cast("double"))
    assertEagerMatch(tied, "v", descending = true)
    assertEagerMatch(tied, "v", descending = false)
    val withNulls = Seq((1L, Some(5.0)), (2L, None), (3L, Some(1.0)),
      (4L, None), (5L, Some(3.0)), (6L, Some(2.0)), (7L, Some(4.0)),
      (8L, Some(0.5)), (9L, Some(6.0)), (10L, Some(7.0))).toDF("id", "v")
    assertEagerMatch(withNulls, "v", descending = true)
    assertEagerMatch(withNulls, "v", descending = false)
    val longs = spark.range(0, 700).toDF("id")
      .withColumn("v", col("id") * 13 % 19)
    assertEagerMatch(longs, "v", descending = true)
    assertEagerMatch(longs, "v", descending = false)
    val decs = spark.range(0, 400).toDF("id")
      .withColumn("v", (col("id") * 7 % 23).cast("decimal(12,2)") / 4)
    assertEagerMatch(decs, "v", descending = true)
    assertEagerMatch(decs, "v", descending = false)
  }

  test("tiersByPercentRankEager property: random frames, many thresholds, " +
    "both directions match the window reference") {
    val rng = new scala.util.Random(23)
    (1 to 3).foreach { round =>
      val n = 50 + rng.nextInt(400)
      val rows = (1 to n).map { i =>
        val v = if (rng.nextInt(10) == 0) None
                else Some((rng.nextInt(12) - 4).toDouble / 4)
        (i.toLong, v)
      }
      val df = rows.toDF("id", "v")
      Seq(true, false).foreach { desc =>
        val thresholds = Seq(0.1, 0.25, 0.5, 0.8, 0.95)
        val labels = Seq("a", "b", "c", "d", "e", "f")
        val got = Ranks.tiersByPercentRankEager(df, "v", thresholds, labels, desc)
          .select("id", "tier").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        val want = referencePr(df, "v", desc)
          .withColumn("tier_ref",
            when(col("pr_ref") <= 0.1, "a").when(col("pr_ref") <= 0.25, "b")
              .when(col("pr_ref") <= 0.5, "c").when(col("pr_ref") <= 0.8, "d")
              .when(col("pr_ref") <= 0.95, "e").otherwise("f"))
          .select("id", "tier_ref").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(got == want, s"round=$round desc=$desc")
      }
    }
  }

  test("tiersByPercentRankEager degenerate frames and lazy agreement") {
    val one = Seq((1L, 9.9)).toDF("id", "v")
    assert(Ranks.tiersByPercentRankEager(one, "v", Seq(0.2, 0.5),
      Seq("Gold", "Silver", "Bronze")).select("tier").head().getString(0)
      === "Gold")
    val allNull = Seq((1L, Option.empty[Double]), (2L, None)).toDF("id", "v")
    assertEagerMatch(allNull, "v", descending = true)
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    assert(Ranks.tiersByPercentRankEager(empty, "v", Seq(0.2, 0.5),
      Seq("Gold", "Silver", "Bronze")).count() === 0)
    // unsupported type (string) falls back to the lazy machinery and
    // still matches it
    val strs = Seq((1L, "b"), (2L, "a"), (3L, "c"), (4L, "a")).toDF("id", "v")
    val lazyT = Ranks.tiersByPercentRank(strs, "v", Seq(0.5),
      Seq("lo", "hi")).select("id", "tier").collect().map(r =>
      r.getLong(0) -> r.getString(1)).toMap
    val eagerT = Ranks.tiersByPercentRankEager(strs, "v", Seq(0.5),
      Seq("lo", "hi")).select("id", "tier").collect().map(r =>
      r.getLong(0) -> r.getString(1)).toMap
    assert(eagerT == lazyT)
  }
}
