package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe for the customer-mart persist-layout question (VERDICT r15
  * item 4): the full 16-column MEMORY_AND_DISK persist feeds ~7 cache
  * scans (boundary agg + selection sweeps + argmin agg + row side), but
  * the rank protocol and the argmin only need 5 narrow columns — is a
  * PRUNED persist plus ONE lazy full-width lineage pass for the row side
  * cheaper? Times both tails from the identical factored lineage
  * ([[graft.pipelines.CustomerSalesReport.metrics]]), best-of-3 each,
  * caches dropped between runs. args: [sfDir].
  * Backs: CustomerSalesReport persist-layout decision note (r16).
  */
object MartPersistAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // JVM warmup

    def clear(): Unit = {
      graft.ops.Ranks.releaseCaches()
      spark.sharedState.cacheManager.clearCache()
    }

    def time(name: String)(f: => DataFrame): Double = {
      val ts = (1 to 3).map { _ =>
        clear()
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[martab] $name%-10s best ${ts.min}%6.3f  runs ${ts.map(t => f"$t%.3f").mkString(" ")}")
      ts.min
    }

    // FULL = the shipping apply() (full-width persist)
    time("full") { graft.pipelines.CustomerSalesReport(spark, sfDir) }

    // PRUNED = same lineage, but persist only the 5 protocol/argmin
    // columns; the row side executes the full lineage lazily ONCE
    time("pruned") {
      val m = graft.pipelines.CustomerSalesReport.metrics(spark, sfDir)
      val p = m.select("CUSTOMER_ID", "SALE_ID", "PRODUCT_ID", "QUANTITY",
          "SALE_AMOUNT")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tier = graft.ops.Ranks.percentRankTierColumn(p, "SALE_AMOUNT",
        thresholds = Seq(0.2, 0.5), labels = Seq("Gold", "Silver", "Bronze"),
        descending = true).get
      val ordKey = struct(
        coalesce(graft.functions.SortableDoubleBits.sortableDoubleBits(
          col("SALE_AMOUNT")).bitwiseXOR(lit(-1L)), lit(Long.MaxValue)).as("a"),
        col("SALE_ID").as("s"), col("PRODUCT_ID").as("p"),
        col("QUANTITY").as("q"))
      val tops = p.withColumn("__ord", ordKey).groupBy("CUSTOMER_ID")
        .agg(graft.functions.MinTieCount.minTieCount(col("__ord")).as("__mt"))
        .select(col("CUSTOMER_ID"), col("__mt.min").as("__ord_min"))
      m.withColumn("LOYALTY_TIER", tier).withColumn("__ord", ordKey)
        .join(tops, Seq("CUSTOMER_ID"))
        .withColumn("TOP_PERFORMER",
          when(col("__ord") === col("__ord_min"), "Yes").otherwise("No"))
        .select("DAY_DT", "CUSTOMER_ID", "CUSTOMER_NAME", "SALE_ID", "CITY",
          "PRODUCT_NAME", "CATEGORY", "SALE_DATE", "SALE_MONTH", "SALE_YEAR",
          "QUANTITY", "PRICE", "SALE_AMOUNT", "TOP_PERFORMER", "LOYALTY_TIER",
          "LOAD_TSTMP")
    }

    time("full2") { graft.pipelines.CustomerSalesReport(spark, sfDir) }
    spark.stop()
  }
}
