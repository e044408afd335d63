package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.TopK

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def winTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("rk", row_number().over(
        Window.partitionBy("grp").orderBy(col("v").desc, col("id"))))
      .filter(col("rk") <= k)
      .select("grp", "rk", "id", "name", "v")

  private def fixture(n: Int, groups: Int, seed: Int) = {
    val rng = new scala.util.Random(seed)
    (1 to n).map { i =>
      (i.toLong, s"g${rng.nextInt(groups)}", s"row$i", rng.nextDouble() * 2000 - 500)
    }.toDF("id", "grp", "name", "v")
  }

  test("topKPerGroup equals the window row_number form on a random frame " +
       "(desc double order, asc id tiebreak)") {
    val df = fixture(5000, 23, seed = 7)
    val got = TopK.topKPerGroup(df, Seq("grp"),
      Seq(TopK.ordDescDouble(col("v")), TopK.ordAsc(col("id"))),
      Seq("id", "name", "v"), 5)
      .select("grp", "rk", "id", "name", "v")
    assert(got.collect().toSet == winTopK(df, 5).collect().toSet)
  }

  test("ties on the value are broken deterministically by the id component") {
    val df = Seq(
      (1L, "a", "x", 10.0), (2L, "a", "y", 10.0), (3L, "a", "z", 10.0),
      (4L, "a", "w", 5.0)).toDF("id", "grp", "name", "v")
    val got = TopK.topKPerGroup(df, Seq("grp"),
      Seq(TopK.ordDescDouble(col("v")), TopK.ordAsc(col("id"))),
      Seq("id"), 2).select("grp", "rk", "id").as[(String, Int, Long)]
      .collect().sortBy(_._2)
    assert(got.toSeq == Seq(("a", 1, 1L), ("a", 2, 2L)))
  }

  test("groups smaller than k return all their rows; k=1 returns the max") {
    val df = fixture(200, 80, seed = 13) // many groups of ~2-3 rows
    val got5 = TopK.topKPerGroup(df, Seq("grp"),
      Seq(TopK.ordDescDouble(col("v")), TopK.ordAsc(col("id"))),
      Seq("id", "name", "v"), 5)
      .select("grp", "rk", "id", "name", "v")
    assert(got5.collect().toSet == winTopK(df, 5).collect().toSet)
    val got1 = TopK.topKPerGroup(df, Seq("grp"),
      Seq(TopK.ordDescDouble(col("v")), TopK.ordAsc(col("id"))),
      Seq("id"), 1)
    val want1 = df.groupBy("grp").agg(max(struct(col("v"), negate(col("id")).as("id"))).as("m"))
      .select(col("grp"), (-col("m.id")).as("id"))
    assert(got1.select("grp", "id").collect().toSet ==
      want1.collect().toSet)
  }

  test("negative and extreme doubles order correctly through the sortable bits") {
    val df = Seq(
      (1L, "a", Double.MinValue), (2L, "a", -1.5), (3L, "a", -0.0),
      (4L, "a", 0.0), (5L, "a", 1.5), (6L, "a", Double.MaxValue))
      .toDF("id", "grp", "v")
    val got = TopK.topKPerGroup(df, Seq("grp"),
      Seq(TopK.ordDescDouble(col("v")), TopK.ordAsc(col("id"))),
      Seq("id", "v"), 3).select("rk", "id").as[(Int, Long)].collect().sortBy(_._1)
    // desc: MaxValue, 1.5, then ±0.0 — both zeros map to 0, id tiebreak picks 3
    assert(got.toSeq == Seq((1, 6L), (2, 5L), (3, 3L)))
  }

  test("ascending long order via bitwise NOT survives the full long range") {
    val df = Seq(
      (Long.MinValue, "a"), (-5L, "a"), (0L, "a"), (7L, "a"), (Long.MaxValue, "a"))
      .toDF("id", "grp")
    val got = TopK.topKPerGroup(df, Seq("grp"), Seq(TopK.ordAsc(col("id"))),
      Seq("id"), 3).select("rk", "id").as[(Int, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1, Long.MinValue), (2, -5L), (3, 0L)))
  }

  test("partial+final split: result is identical under 1 vs many partitions") {
    val df = fixture(3000, 11, seed = 29)
    val many = TopK.topKPerGroup(df.repartition(13), Seq("grp"),
      Seq(TopK.ordDescDouble(col("v")), TopK.ordAsc(col("id"))),
      Seq("id", "name", "v"), 4).collect().toSet
    val one = TopK.topKPerGroup(df.coalesce(1), Seq("grp"),
      Seq(TopK.ordDescDouble(col("v")), TopK.ordAsc(col("id"))),
      Seq("id", "name", "v"), 4).collect().toSet
    assert(many == one)
  }
}
