package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicInteger

/** Dev probe: phase timing inside q_nb_cv — how much of the wall is the
  * constant-grid collects vs the scoring DAG. args: [sfDir].
  * Backs: Classifier.nbCrossValidate scheduler-floor documentation + NOTES job-count profiles (r13-r15).
  */
object CvPhaseProbe {
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
    for (round <- 1 to 3) {
      graft.ops.Classifier.releaseCaches()
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val df = graft.ops.Classifier.nbCrossValidate(
        docs, "doc_id", "text", "lang", folds = 5)
      val t1 = System.nanoTime(); val j1 = jobs.get()
      df.orderBy("fold").write.mode("overwrite").format("noop").save()
      val t2 = System.nanoTime(); val j2 = jobs.get()
      println(f"round $round: build(collects) ${(t1 - t0) / 1e9}%5.2fs/${j1 - j0}%3d jobs" +
        f"   action ${(t2 - t1) / 1e9}%5.2fs/${j2 - j1}%3d jobs")
    }
    spark.stop()
  }
}
