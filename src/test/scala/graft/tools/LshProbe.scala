package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}

/** Dev probe: bucket-occupancy distribution and candidate-pair volume of
  * the auto-sized cosine-LSH config on a given embeddings fixture —
  * separates "candidate volume grew" from "execution overhead grew" when a
  * scale point misbehaves.
  *
  * Usage: runMain graft.tools.LshProbe <sfDir>
  * Backs: SCALE.md 414x-candidates analysis + lshConfigFor sizing-law rows.
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    val n = e.count()
    val (tables, planes) = Dedup.lshConfigFor(n, 0.9)
    println(s"[probe] n=$n tables=$tables planes=$planes meanOcc=${n.toDouble / (1L << planes)}")
    val b = Similarity.lshBuckets(e, "v", tables, planes).select("table", "bucket")
    val occ = b.groupBy("table", "bucket").agg(count(lit(1)).as("occ"))
    val stats = occ.agg(
      count(lit(1)).as("nonempty_buckets"),
      max("occ").as("max_occ"),
      avg("occ").as("avg_occ"),
      sum(expr("occ * (occ - 1)")).as("candidate_pairs_x2"))
      .collect()(0)
    println(s"[probe] nonempty=${stats.getAs[Any](0)} maxOcc=${stats.getAs[Any](1)} " +
      s"avgOcc=${stats.getAs[Any](2)} candPairsWithDups=${stats.getAs[Long](3) / 2}")
    val top = occ.orderBy(col("occ").desc).limit(10).collect()
      .map(r => s"(t=${r.getAs[Any]("table")},occ=${r.getAs[Any]("occ")})").mkString(" ")
    println(s"[probe] top buckets: $top")
    spark.stop()
  }
}
