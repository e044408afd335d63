package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decompose the customer_sales_report wall time per phase (VERDICT r17
  * item 1): the cell oscillates 2.7–7.9 s across bench windows while its
  * oracle holds ~1.6 s, and nobody has measured WHICH phase moves. The
  * mart runs in three phases:
  *
  *   A. pruned-persist build — the 5-column projection of the metrics
  *      lineage materializes into the cache (scan + two joins + decimal
  *      math), forced here with a count();
  *   B. boundary protocol — [[graft.ops.Ranks.percentRankTierColumn]]'s
  *      EAGER driver-side jobs over the cache (count+sketch agg, exact
  *      selection sweeps) that compile the tier Column to literals;
  *   C. tail — argmin aggregation + broadcast join + the lazy full-width
  *      row side through the final noop write (one more execution of the
  *      metrics lineage by design — the measured r16 persist-layout
  *      choice).
  *
  * Per repetition every phase is timed separately WITH job/stage counts
  * (a SparkListener), caches dropped between reps, `reps` repetitions so
  * the swing — if it reproduces — lands in a phase, not in folklore.
  * Backs: NOTES_r18 mart-swing decomposition + the SCALE.md mart row.
  *
  * Usage: Test/runMain graft.tools.MartPhaseProbe [sfDir] [reps=6]
  */
object MartPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 6
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // JVM warmup

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet(): Unit
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          tasks.incrementAndGet(): Unit
      })

    def phase[T](name: String)(f: => T): (T, Double, Int, Int) = {
      val j0 = jobs.get(); val t0 = tasks.get()
      val n0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - n0) / 1e9
      (r, sec, jobs.get() - j0, tasks.get() - t0)
    }

    def load1 = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

    println("rep  load1   A:persist(s,jobs,tasks)  B:boundary(s,jobs,tasks)  " +
      "C:tail(s,jobs,tasks)  total")
    for (rep <- 1 to reps) {
      graft.ops.Ranks.releaseCaches()
      spark.sharedState.cacheManager.clearCache()
      val l = load1

      val m = graft.pipelines.CustomerSalesReport.metrics(spark, sfDir)
      val pruned = m
        .select("CUSTOMER_ID", "SALE_ID", "PRODUCT_ID", "QUANTITY", "SALE_AMOUNT")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (_, aSec, aJ, aT) = phase("A") { pruned.count() }

      val (tier, bSec, bJ, bT) = phase("B") {
        graft.ops.Ranks.percentRankTierColumn(pruned, "SALE_AMOUNT",
          thresholds = Seq(0.2, 0.5), labels = Seq("Gold", "Silver", "Bronze"),
          descending = true).get
      }

      val (_, cSec, cJ, cT) = phase("C") {
        val ordKey = struct(
          coalesce(graft.functions.SortableDoubleBits.sortableDoubleBits(
            col("SALE_AMOUNT")).bitwiseXOR(lit(-1L)), lit(Long.MaxValue)).as("a"),
          col("SALE_ID").as("s"), col("PRODUCT_ID").as("p"),
          col("QUANTITY").as("q"))
        val keyed = m.withColumn("LOYALTY_TIER", tier).withColumn("__ord", ordKey)
        val tops = pruned.withColumn("__ord", ordKey).groupBy("CUSTOMER_ID")
          .agg(graft.functions.MinTieCount.minTieCount(col("__ord")).as("__mt"))
          .select(col("CUSTOMER_ID"), col("__mt.min").as("__ord_min"),
            col("__mt.ties").as("__ord_ties"))
        keyed.join(tops, Seq("CUSTOMER_ID"))
          .withColumn("TOP_PERFORMER",
            when(col("__ord") === col("__ord_min"), "Yes").otherwise("No"))
          .select("DAY_DT", "CUSTOMER_ID", "CUSTOMER_NAME", "SALE_ID", "CITY",
            "PRODUCT_NAME", "CATEGORY", "SALE_DATE", "SALE_MONTH", "SALE_YEAR",
            "QUANTITY", "PRICE", "SALE_AMOUNT", "TOP_PERFORMER", "LOYALTY_TIER",
            "LOAD_TSTMP")
          .write.mode("overwrite").format("noop").save()
      }
      pruned.unpersist(blocking = false)
      println(f"$rep%3d  $l%5.2f   A ${aSec}%6.3f $aJ%3d $aT%5d    " +
        f"B ${bSec}%6.3f $bJ%3d $bT%5d    C ${cSec}%6.3f $cJ%3d $cT%5d   " +
        f"${aSec + bSec + cSec}%6.3f")
    }

    // the shipping apply() end to end for the same reps, as the control
    for (rep <- 1 to reps) {
      graft.ops.Ranks.releaseCaches()
      spark.sharedState.cacheManager.clearCache()
      val l = load1
      val (_, sec, j, t) = phase("full") {
        graft.pipelines.CustomerSalesReport(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
      }
      println(f"full $rep%2d  load1 $l%5.2f  ${sec}%6.3f s  $j%3d jobs $t%5d tasks")
    }
    spark.stop()
  }
}
