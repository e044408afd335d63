package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicInteger

/** Dev probe behind the r11 NB/events/composite-join perf work
  * (VERDICT r10 tasks 3–5): wall time + job count of each target query
  * in a warmed JVM, measured twice — `cold` (graft caches released
  * first, the worst case) and `resident` (immediately re-run, the
  * within-suite/bench-pass case where plan-keyed caches are shared).
  * args: [sfDir].
  * Backs: NOTES_r11 NB/events cold-vs-resident walls; the cache-release list MUST mirror Bench.onePass (NOTES_r14).
  */
object NbEventsProbe {
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
        jobs.incrementAndGet(); ()
      }
    })
    def release(): Unit = {
      graft.ops.Classifier.releaseCaches()
      graft.ops.Dedup.releaseCaches()
      graft.ops.Ranks.releaseCaches()
      graft.ops.TimeSeries.releaseCaches()
      graft.pipelines.ResultSort.releaseCaches()
      spark.sharedState.cacheManager.clearCache()
    }
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // JVM warmup
    val names = (if (args.length > 1) args.drop(1).toSeq else Seq(
      "q_nb_cv", "q_nb_calibration", "q_nb_margin",
      "q_events_gapfill_locf", "q_events_gap_summary", "q_join_composite"))
    def once(name: String): (Double, Int) = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      ((System.nanoTime() - t0) / 1e9, jobs.get() - j0)
    }
    names.foreach { name =>
      release()
      val (tc, jc) = once(name)
      val (tr, jr) = once(name)
      println(f"$name%-26s cold ${tc}%6.2fs/${jc}%3d jobs   " +
        f"resident ${tr}%6.2fs/${jr}%3d jobs")
    }
    // the suite case: gapfill then summary WITHOUT a release between —
    // the r11 grid cache makes the second grid-free
    release()
    val (t1, j1) = once("q_events_gapfill_locf")
    val (t2, j2) = once("q_events_gap_summary")
    println(f"locf->summary shared       ${t1}%6.2fs/${j1}%3d + ${t2}%6.2fs/${j2}%3d jobs")
    release()
    val (t3, j3) = once("q_nb_margin")
    val (t4, j4) = once("q_nb_calibration")
    println(f"margin->calibration shared ${t3}%6.2fs/${j3}%3d + ${t4}%6.2fs/${j4}%3d jobs")
    spark.stop()
  }
}
