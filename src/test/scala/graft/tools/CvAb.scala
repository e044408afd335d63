package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicInteger

/** Dev probe: q_nb_cv scoring action with AQE on (current) vs pinned
  * off — does the ~10-stage-job AQE floor outweigh AQE's runtime
  * broadcast of the per-doc `present` frame at sf0.1? Alternating
  * rounds, caches released per round. Measured r15: AQE-off reaches
  * the ≤8-job form (4 build + 4 action) and the wall does NOT improve
  * — the scheduler-floor hypothesis is closed.
  * Backs: Classifier.nbCrossValidate NEGATIVE PROBES item (c) + NOTES_r15 q_nb_cv closure. */
object CvAb {
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
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val docs = graft.model.Entities.read(spark, sfDir, "documents")
    docs.count()
    def run(aqeOff: Boolean): (Double, Double, Int) = {
      graft.ops.Classifier.releaseCaches()
      val t0 = System.nanoTime()
      val df = graft.ops.Classifier.nbCrossValidate(
        docs, "doc_id", "text", "lang", folds = 5)
      val t1 = System.nanoTime(); val j1 = jobs.get()
      def action(): Unit =
        df.orderBy("fold").write.mode("overwrite").format("noop").save()
      if (aqeOff)
        graft.ops.ConfWindows.withOverrides(spark,
          Seq("spark.sql.adaptive.enabled" -> "false")) { action() }
      else action()
      val t2 = System.nanoTime(); val j2 = jobs.get()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9, j2 - j1)
    }
    for (round <- 1 to 4; off <- Seq(false, true)) {
      val (b, a, j) = run(off)
      println(f"round $round aqeOff=$off%-5s build $b%5.2fs  action $a%5.2fs/$j%3d jobs")
    }
    spark.stop()
  }
}
