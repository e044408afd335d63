package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: the r10 small-input gates at replica scale — verifies the
  * quantile capped-sort gate falls back to the selection protocol when
  * groups outgrow it, and the graph gate reverts to the distributed CC
  * loop on a 100x pair graph, with timings for SCALE.md.
  * Usage: runMain graft.tools.GateScaleProbe [dir]
  * Backs: NOTES_r10 small-input gate fallbacks at replica scale.
  */
object GateScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/r8x100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[gatescale] $name%-36s ${(System.nanoTime() - t0) / 1e9}%7.2fs  ($r)")
    }
    val events = graft.model.Entities.read(spark, dir, "events")
    events.count() // warm
    timed("hourly_bands (grouped double q)") {
      val e = events.withColumn("hour", date_trunc("hour", col("ts")))
      graft.ops.Quantiles.groupedExactQuantilesDouble(e, "hour", "value",
        Seq("p50" -> 0.5, "p95" -> 0.95)).count()
    }
    timed("value_quantiles (global double q)") {
      graft.ops.Quantiles.exactQuantilesDouble(events, "value",
        Seq(0.50, 0.90, 0.99)).map(_._2.round).mkString(",")
    }
    timed("outlier_mad count") {
      graft.ops.Outliers.madOutliers(events, "event_type", "value", k = 3.0)
        .filter(col("is_outlier")).count()
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    timed("textrank (word graph)") {
      graft.ops.TextAnalysis // force load
      val toks = docs.select(graft.ops.TextAnalysis.tokens(lower(col("text"))).as("tk"))
      val bi = toks.select(explode(
          when(size(col("tk")) >= 2,
            transform(sequence(lit(0), size(col("tk")) - 2),
              i => struct(element_at(col("tk"), i + 1).as("w1"),
                element_at(col("tk"), i + 2).as("w2"))))
            .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("e"))
        .select(col("e.w1").as("w1"), col("e.w2").as("w2"))
        .filter(col("w1") =!= col("w2"))
      val edges = bi.select(col("w1").as("src"), col("w2").as("dst"))
      graft.ops.Graph.pageRank(edges, "src", "dst", iters = 4).count()
    }
    timed("near-dup clusters (0.8 jaccard CC)") {
      graft.ops.Dedup.nearDupClusters(docs,
        graft.ops.Dedup.jaccardPairsAdaptive(docs, "doc_id", "text", 3, 0.8),
        "doc_id").count()
    }
    spark.stop()
  }
}
