package graft

import org.apache.spark.sql.functions._
import graft.io.Sinks

/** The co-located-join story: two tables bucketed by the join key join
  * with NO shuffle exchange — the 100 TB posture for the fact⋈fact
  * backbone (lineitem⋈orders) and for the persisted incremental-dedup
  * corpus index. */
class BucketingSpec extends SparkSpec {

  test("persisted bucketed CorpusIndex: same pairs, corpus side never shuffles") {
    import graft.ops.Dedup
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val inline = Dedup.buildCorpusIndex(corpus, "doc_id", "text", 3)
    Dedup.persistCorpusIndex(inline, "graft_ci_spec", buckets = 8)
    try {
      val loaded = Dedup.loadCorpusIndex(spark, "graft_ci_spec")
      assert(loaded.n === 3)
      // row-identical pairs through the persisted layout
      def key(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val viaDisk = key(Dedup.minhashLshCrossPairsIndexed(loaded, batch,
        "doc_id", "text", 0.8))
      val viaInline = key(Dedup.minhashLshCrossPairsIndexed(inline, batch,
        "doc_id", "text", 0.8))
      assert(viaDisk == viaInline && viaDisk.nonEmpty)
      // the incremental join's corpus side reads bucket metadata: with
      // broadcast off, the (band, bucket) join plans ONE exchange — the
      // batch side — where the unbucketed form needs both
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val batchBanded = Dedup.buildCorpusIndex(batch, "doc_id", "text", 3).banded
        def exchanges(df: org.apache.spark.sql.DataFrame): Int =
          "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size
        val bucketedJoin = loaded.banded.as("a").join(batchBanded.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
        val inlineJoin = inline.banded.as("a").join(batchBanded.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
        assert(exchanges(bucketedJoin) < exchanges(inlineJoin),
          "bucketed corpus side must drop its exchange")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally Seq("index", "sizes", "banded", "meta").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS graft_ci_spec_$s"))
  }

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
