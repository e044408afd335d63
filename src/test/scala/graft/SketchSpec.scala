package graft

import org.apache.spark.sql.functions._

/** The at-scale approximate alternatives documented in SURVEY.md §2.5
  * (A4: `approx_count_distinct` replaces exact countDistinct at 100 TB)
  * — sketches are engine capability, verified against exact answers with
  * tolerance (they have no cross-engine oracle by nature). */
class SketchSpec extends SparkSpec {

  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")

  test("approx_count_distinct (HLL++) within 5% of exact") {
    val exact = li.select(countDistinct("l_partkey")).first().getLong(0)
    val approx = li.select(approx_count_distinct("l_partkey", 0.02))
      .first().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("approxQuantile (Greenwald-Khanna) brackets the exact median") {
    val Array(q50) = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.01)
    val n = li.count()
    val below = li.filter(col("l_extendedprice") <= q50).count().toDouble / n
    assert(below > 0.45 && below < 0.55, s"median rank off: $below")
  }

  test("grouped HLL sketches merge: per-flag distincts vs global") {
    // partial sketches per group merge into the global — the property
    // that makes HLL aggregation shuffle-light at scale
    val perGroup = li.groupBy("l_returnflag")
      .agg(approx_count_distinct("l_partkey", 0.02).as("d"))
      .agg(max("d")).first().getLong(0)
    val global = li.select(approx_count_distinct("l_partkey", 0.02))
      .first().getLong(0)
    assert(perGroup <= global * 1.05)
  }
}
