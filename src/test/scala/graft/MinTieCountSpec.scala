package graft

import org.apache.spark.sql.functions._
import graft.functions.MinTieCount.minTieCount

/** MinTieCount: one aggregation yielding (min, #rows attaining it) —
  * the fused guard behind the customer_sales_report argmin flag (a tie
  * on the full ordering key must fail loudly, not silently flag every
  * tied row 'Yes'). Exercises update, merge (forced via repartition so
  * partial buffers combine), struct keys, and null inputs. */
class MinTieCountSpec extends SparkSpec {
  import spark.implicits._

  test("long keys: min and tie count across partitions") {
    val df = Seq(
      ("a", 5L), ("a", 3L), ("a", 3L), ("a", 9L),
      ("b", 7L), ("b", 7L), ("b", 7L),
      ("c", 1L)).toDF("g", "v").repartition(5)
    val out = df.groupBy("g").agg(minTieCount(col("v")).as("mt"))
      .select(col("g"), col("mt.min").as("m"), col("mt.ties").as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("a") == (3L, 2L))
    assert(out("b") == (7L, 3L))
    assert(out("c") == (1L, 1L))
  }

  test("struct keys order lexicographically (the __ord shape)") {
    val df = Seq(
      ("a", 1L, 2L), ("a", 1L, 1L), ("a", 1L, 1L), ("a", 0L, 9L),
      ("b", 4L, 4L), ("b", 4L, 4L)).toDF("g", "x", "y").repartition(3)
    val out = df.groupBy("g")
      .agg(minTieCount(struct(col("x"), col("y"))).as("mt"))
      .select(col("g"), col("mt.min.x"), col("mt.min.y"), col("mt.ties"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // (0,9) < (1,1): struct order is field-by-field, min is unique
    assert(out("a") == (0L, 9L, 1L))
    assert(out("b") == (4L, 4L, 2L))
  }

  test("null inputs contribute nothing; all-null group -> (null, 0)") {
    val df = Seq(
      ("a", Some(2L)), ("a", None), ("a", Some(2L)),
      ("n", None), ("n", None)).toDF("g", "v").repartition(4)
    val rows = df.groupBy("g").agg(minTieCount(col("v")).as("mt"))
      .select(col("g"), col("mt.min"), col("mt.ties")).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1), r.getLong(2))).toMap
    assert(rows("a") == (2L, 2L))
    assert(rows("n") == (null, 0L))
  }

  test("the argmin-flag tie guard fires loudly (the CSR pattern)") {
    val df = Seq((1L, 10L), (1L, 10L), (2L, 5L)).toDF("cust", "ord")
    val tops = df.groupBy("cust").agg(minTieCount(col("ord")).as("mt"))
      .select(col("cust"), col("mt.min").as("m"), col("mt.ties").as("t"))
    val flagged = df.join(tops, "cust")
      .withColumn("flag",
        when(col("ord") === col("m") && col("t") > 1,
          raise_error(lit("ordering key is not unique")).cast("string"))
          .when(col("ord") === col("m"), "Yes").otherwise("No"))
    val e = intercept[Exception] { flagged.collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("ordering key is not unique")))
    // and the untied path stays green
    val ok = df.dropDuplicates("cust", "ord").join(
      df.dropDuplicates("cust", "ord").groupBy("cust")
        .agg(minTieCount(col("ord")).as("mt"))
        .select(col("cust"), col("mt.min").as("m"), col("mt.ties").as("t")),
      "cust")
      .withColumn("flag",
        when(col("ord") === col("m") && col("t") > 1,
          raise_error(lit("boom")).cast("string"))
          .when(col("ord") === col("m"), "Yes").otherwise("No"))
    assert(ok.filter(col("flag") === "Yes").count() == 2)
  }
}
