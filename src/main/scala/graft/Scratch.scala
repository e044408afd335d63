package graft

// DEV-ONLY round-14 profiler (deleted before round end, per protocol):
// counts scheduler jobs and per-job wall for one query — the job-count ×
// ~100 ms scheduler floor dominates many sf0.1 cells.
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val q = if (args.nonEmpty) args(0) else "q_nb_cv"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val stages = js.stageInfos.map(si =>
          s"${si.name.takeWhile(_ != ' ')}:${si.numTasks}").mkString(",")
        starts.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description"))
            .filter(_.nonEmpty).getOrElse(stages)))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null)
          rows.add((je.jobId, (System.nanoTime() - s._1) / 1e9,
            s._2.take(90)))
      }
    })

    // warm pass (codegen), then measured pass
    def once(): Double = {
      graft.ops.Classifier.releaseCaches()
      graft.ops.Dedup.releaseCaches()
      graft.ops.Ranks.releaseCaches()
      graft.ops.TextAnalysis.releaseCaches()
      graft.pipelines.ResultSort.releaseCaches()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    once()
    rows.clear()
    val wall = once()
    println(f"== $q wall $wall%.3f s, jobs ${rows.size()} ==")
    rows.forEach { case (id, t, d) => println(f"  job $id%4d  $t%7.3f s  $d") }
    spark.stop()
  }
}
