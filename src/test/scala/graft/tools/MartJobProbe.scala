package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicInteger

/** Dev probe: job count + wall time of customer_sales_report phases at a
  * fixture dir (args: [sfDir]) — the measurement behind the r10 mart
  * wall-clock work.
  * Backs: SCALE.md customer-mart phase walls + NOTES_r14 item 2 (gather-in-loop fix).
  */
object MartJobProbe {
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
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (sys.props.contains("graft.mart.debug") ||
            sys.env.contains("GRAFT_MART_DEBUG"))
          println(s"  job ${js.jobId} t=${System.nanoTime()/1000000%100000}: " +
            js.stageInfos.map(si => s"${si.name.takeWhile(_ != '(')}x${si.numTasks}")
              .mkString(" | "))
      }
    })
    def timed(name: String)(f: => Unit): Unit = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs  jobs=${jobs.get() - j0}")
    }
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // warmup
    (1 to 2).foreach { pass =>
      graft.ops.Ranks.releaseCaches()
      graft.pipelines.ResultSort.releaseCaches()
      timed(s"mart_pass$pass") {
        graft.pipelines.CustomerSalesReport(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
