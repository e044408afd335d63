package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipelines.{CustomerSalesReport, ProductPerformance, SupplierPerformance}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a pure `(SparkSession, sfDir) => DataFrame`
  * pipeline over the driver fixtures; [[oracleSql]] carries the DuckDB
  * equivalent the driver uses for differential correctness at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    SupplierPerformance(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "supplier_performance" -> ((s, dir) => SupplierPerformance(s, dir)),
    "product_performance" -> ((s, dir) => ProductPerformance(s, dir)),
    "customer_sales_report" -> ((s, dir) => CustomerSalesReport(s, dir)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "supplier_performance" -> SupplierPerformance.oracle,
    "product_performance" -> ProductPerformance.oracle,
    "customer_sales_report" -> CustomerSalesReport.oracle,
  )
}
