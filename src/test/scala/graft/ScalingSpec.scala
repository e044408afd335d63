package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Scaling

class ScalingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("robustScale equals the window-rank formulation") {
    // reference: same rank definition (k = max(1, ceil(q*n)), lower tie)
    // computed the single-node way with a per-group window sort
    val w = Window.partitionBy("lang").orderBy("n_chars")
    val ranked = docs.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
    def pick(q: Double, name: String) = ranked
      .filter(col("rn") === greatest(lit(1L), ceil(lit(q) * col("n")).cast("long")))
      .select(col("lang"), col("n_chars").as(name))
    val stats = pick(0.25, "p25").join(pick(0.50, "p50"), "lang")
      .join(pick(0.75, "p75"), "lang")
    val expected = docs.join(stats, "lang")
      .withColumn("robust_z",
        when(col("p75") === col("p25"), lit(null).cast("double"))
          .otherwise((col("n_chars") - col("p50")).cast("double") /
            (col("p75") - col("p25")).cast("double")))
      .select("doc_id", "robust_z").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap

    val got = Scaling.robustScale(docs, "lang", "n_chars")
      .select("doc_id", "robust_z").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got == expected)
  }

  test("minMaxScale lands in [0,1] with extrema at the ends") {
    val scaled = Scaling.minMaxScale(docs, "lang", "n_chars")
    val bad = scaled.filter(col("minmax") < 0 || col("minmax") > 1).count()
    assert(bad == 0)
    // every group with >1 distinct value hits both 0.0 and 1.0
    val ends = scaled.groupBy("lang")
      .agg(min("minmax").as("lo"), max("minmax").as("hi")).collect()
    ends.foreach { r =>
      assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 1.0, r.toString)
    }
  }

  test("degenerate (constant) group scales to NULL") {
    val df = Seq(("a", 5L), ("a", 5L), ("b", 1L), ("b", 3L))
      .toDF("g", "v")
    val mm = Scaling.minMaxScale(df, "g", "v")
    assert(mm.filter(col("g") === "a" && col("minmax").isNotNull).count() == 0)
    assert(mm.filter(col("g") === "b" && col("minmax").isNull).count() == 0)
    val rs = Scaling.robustScale(df, "g", "v")
    assert(rs.filter(col("g") === "a" && col("robust_z").isNotNull).count() == 0)
  }

  test("winsorize clips to the per-group percentile-disc band") {
    // group of 1..20: p05 rank = ceil(0.05*20) = 1 -> lo = 1;
    // p95 rank = ceil(0.95*20) = 19 -> hi = 19. Only v=20 clips.
    val df = (1L to 20L).map(v => ("g", v)).toDF("g", "v")
    val out = Scaling.winsorize(df, "g", "v", 0.05, 0.95)
      .orderBy("v").collect()
    assert(out.map(_.getAs[Long]("clipped")).toSeq ==
      ((1L to 19L) :+ 19L))
    assert(out.map(_.getAs[Int]("was_clipped")).sum == 1)
  }

  test("winsorize on the documents fixture: band respected, interior untouched") {
    val out = Scaling.winsorize(docs, "lang", "n_chars", 0.10, 0.90)
    // clipped values sit inside [per-group min clipped, max clipped]
    val viol = out.filter(
      (col("was_clipped") === 0 && col("clipped") =!= col("n_chars")) ||
      (col("was_clipped") === 1 && col("clipped") === col("n_chars")))
    assert(viol.count() == 0)
    // clipping at [0.10, 0.90] must move at most ~20% of each group
    val frac = out.groupBy("lang")
      .agg((sum("was_clipped") / count(lit(1))).as("f")).collect()
    frac.foreach(r => assert(r.getDouble(1) <= 0.21, r.toString))
  }
}
