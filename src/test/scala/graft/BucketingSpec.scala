package graft

import org.apache.spark.sql.functions._
import graft.io.Sinks

/** The co-located-join story: two tables bucketed by the join key join
  * with NO shuffle exchange — the 100 TB posture for the fact⋈fact
  * backbone (lineitem⋈orders). */
class BucketingSpec extends SparkSpec {

  test("same-bucketed tables join without a shuffle exchange") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_orderstatus")
    Sinks.bucketed(li, "li_bucketed", 8, Seq("l_orderkey"))
    Sinks.bucketed(ord, "ord_bucketed", 8, Seq("o_orderkey"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle; plan:\n$plan")
      // and it is still the correct join
      val expected = li.join(ord, li("l_orderkey") === ord("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
