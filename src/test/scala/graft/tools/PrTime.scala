package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicInteger

/** Dev probe: wall/job breakdown of the TextRank queries (edge build vs
  * PageRank loop) at a fixture dir (args: [sfDir]). */
object PrTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def timed(name: String)(f: => Unit): Unit = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      f
      println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%6.2fs  jobs=${jobs.get() - j0}")
    }
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def edges() = {
      val toks = docs.select(graft.ops.TextAnalysis.tokens(lower(col("text"))).as("tk"))
      val bi = toks.select(explode(
          when(size(col("tk")) >= 2,
            transform(sequence(lit(0), size(col("tk")) - 2),
              i => struct(element_at(col("tk"), i + 1).as("w1"),
                element_at(col("tk"), i + 2).as("w2"))))
            .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("e"))
        .select(col("e.w1").as("w1"), col("e.w2").as("w2"))
        .filter(col("w1") =!= col("w2"))
      bi.select(explode(array(
          struct(col("w1").as("src"), col("w2").as("dst")),
          struct(col("w2").as("src"), col("w1").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    }
    (1 to 2).foreach { pass =>
      timed(s"p$pass edge build+count") {
        println("  edges=" + edges().count())
      }
      timed(s"p$pass pr iters=0") {
        graft.ops.Graph.pageRankWeighted(edges(), "src", "dst", "w", iters = 0).count()
      }
      timed(s"p$pass pr iters=4") {
        graft.ops.Graph.pageRankWeighted(edges(), "src", "dst", "w", iters = 4).count()
      }
      timed(s"p$pass full query") {
        graft.ops.Graph.pageRankWeighted(edges(), "src", "dst", "w", iters = 4)
          .orderBy(desc("rank_scaled"), asc("node")).limit(50).count()
      }
    }
    spark.stop()
  }
}
