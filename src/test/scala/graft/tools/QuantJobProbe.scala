package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicInteger

/** Dev probe: job count + wall time of the quantile-protocol queries at a
  * given fixture dir (args: [sfDir]) — the measurement behind the r10
  * gather fast path.
  * Backs: NOTES_r14 selection-protocol job profile (18->12 jobs) + SCALE.md mart scheduler-profile claim.
  */
object QuantJobProbe {
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
    val verbose = sys.props.contains("graft.quant.debug")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          val desc = Option(js.properties)
            .map(_.getProperty("spark.job.description", "")).getOrElse("")
          println(s"  job ${js.jobId}: stages=${js.stageInfos.size} " +
            js.stageInfos.map(si => s"${si.name.takeWhile(_ != '(')}x${si.numTasks}")
              .mkString(" | ") + s"  desc=${desc.take(120)}")
          js.stageInfos.foreach { si =>
            val graftLines = si.details.linesIterator
              .filter(l => l.contains("graft") || l.contains("Quantiles"))
              .take(2).mkString(" <- ")
            if (si.name.contains("CompletableFuture"))
              println(s"    stage${si.stageId}: rdds=" +
                si.rddInfos.map(ri => s"${ri.name}#${ri.id}p${ri.numPartitions}")
                  .mkString(",") + s" $graftLines")
          }
        }
      }
    })
    def timed(name: String)(f: => Unit): Unit = {
      f // warm
      val j0 = jobs.get(); val t0 = System.nanoTime()
      f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs  jobs=${jobs.get() - j0}")
    }
    val events = graft.model.Entities.read(spark, sfDir, "events")
    timed("hb_mapped_persist") {
      import org.apache.spark.sql.functions._
      val m = events.withColumn("hour", date_trunc("hour", col("ts")))
        .select(col("hour"), graft.functions.SortableDoubleBits
          .sortableDoubleBits(col("value").cast("double")).as("__s"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      m.count()
      m.unpersist(blocking = true)
    }
    timed("hourly_bands") {
      import org.apache.spark.sql.functions._
      val e = events.withColumn("hour", date_trunc("hour", col("ts")))
      graft.ops.Quantiles.groupedExactQuantilesDouble(e, "hour", "value",
        Seq("p50" -> 0.5, "p95" -> 0.95)).orderBy("hour").collect()
    }
    timed("value_quantiles") {
      graft.ops.Quantiles.exactQuantilesDouble(events, "value",
        Seq(0.50, 0.90, 0.99))
    }
    timed("outlier_mad") {
      graft.ops.Outliers.madOutliers(events, "event_type", "value", k = 3.0)
        .filter(org.apache.spark.sql.functions.col("is_outlier")).count()
    }
    spark.stop()
  }
}
