package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Entities
import graft.model.Entities.{dec, decQ}

/** Product performance mart — re-expression of the reference DAG node
  * `m_load_products_performance` (reference:
  * `ETL_Airflow/dags/tasks/m_product_performance_task.py:13-111`):
  *
  *   products ⟕ sales → SALES_AMOUNT = qty*price,
  *   PROFIT_AMOUNT = qty*(price-cost)
  *   → AGG by product (sum qty, sum sales, avg price, sum profit)
  *   → self-referencing inner join back to products (the AGG/PROD alias
  *     trap, reference `:69-84`) for stock columns
  *   → STOCK_LEVEL_STATUS when/otherwise → target.
  *
  * Determinism: AVG_SALE_PRICE is the average of a constant per group in
  * the reference (selling price repeated per sale row); we compute it as
  * exact decimal SUM/COUNT division done in DOUBLE at the end so Spark and
  * DuckDB agree bit-for-bit (their decimal-division scale rules differ).
  *
  * Scale posture (plan-reviewed): sales is AGGREGATED BY PRODUCT BEFORE
  * the products outer join — a left outer preserving the dim side cannot
  * broadcast, so joining the raw fact table would sort-merge |sales|
  * rows; aggregating first shrinks the join to |products| vs |products|.
  * Values are identical because decimal arithmetic distributes exactly:
  * Σ(qty·price) = (Σqty)·price per product (price constant per group),
  * and the per-group price sum is price·n. The final AGG⋈PROD dim join
  * broadcasts products.
  */
object ProductPerformance {

  def apply(spark: SparkSession, dir: String): DataFrame = {
    val products = Entities.products(spark, dir)
      .select("PRODUCT_ID", "PRODUCT_NAME", "SELLING_PRICE", "CATEGORY",
        "COST_PRICE", "STOCK_QUANTITY", "REORDER_LEVEL")
    val sales = Entities.sales(spark, dir).select("PRODUCT_ID", "QUANTITY")

    // Pre-aggregate the fact side: one row per product before any join.
    val salesAgg = sales.groupBy(sales("PRODUCT_ID").as("SP_ID"))
      .agg(sum("QUANTITY").as("qty_sum"), count(lit(1)).as("n_sales"))

    // Wider qty decimal than the per-row cast: a per-product SUM of
    // quantities needs more digits than one quantity (100 TB posture).
    val qtySum = col("qty_sum").cast(org.apache.spark.sql.types.DecimalType(18, 2))

    val agg = products
      .join(salesAgg, products("PRODUCT_ID") === col("SP_ID"), "left")
      .select(products("PRODUCT_ID"), products("PRODUCT_NAME"),
        products("CATEGORY"), products("SELLING_PRICE"), products("COST_PRICE"),
        col("qty_sum"), col("n_sales"))
      .withColumn("agg_QUANTITY", col("qty_sum"))
      .withColumn("agg_TOTAL_SALES_AMOUNT", qtySum * dec(col("SELLING_PRICE")))
      .withColumn("agg_PROFIT_AMOUNT",
        qtySum * (dec(col("SELLING_PRICE")) - dec(col("COST_PRICE"))))
      // the reference's avg(SELLING_PRICE) pieces: the no-sales product
      // still contributes its one left-join row (count = 1)
      .withColumn("agg_PRICE_CNT", coalesce(col("n_sales"), lit(1L)))
      .withColumn("agg_PRICE_SUM", dec(col("SELLING_PRICE")) * col("agg_PRICE_CNT"))

    agg.as("AGG")
      .join(broadcast(products.as("PROD")),
        col("AGG.PRODUCT_ID") === col("PROD.PRODUCT_ID"), "inner")
      .select(
        col("AGG.PRODUCT_ID").as("PRODUCT_ID"),
        col("AGG.PRODUCT_NAME").as("PRODUCT_NAME"),
        col("AGG.CATEGORY").as("CATEGORY"),
        col("AGG.agg_TOTAL_SALES_AMOUNT").cast("double").as("TOTAL_SALES_AMOUNT"),
        col("AGG.agg_QUANTITY").cast("double").as("TOTAL_QUANTITY_SOLD"),
        (col("AGG.agg_PRICE_SUM").cast("double") / col("AGG.agg_PRICE_CNT")).as("AVG_SALE_PRICE"),
        col("AGG.agg_PROFIT_AMOUNT").cast("double").as("PROFIT"),
        col("PROD.STOCK_QUANTITY").as("STOCK_QUANTITY"),
        col("PROD.REORDER_LEVEL").as("REORDER_LEVEL"))
      .withColumn("STOCK_LEVEL_STATUS",
        when(col("STOCK_QUANTITY") <= col("REORDER_LEVEL"), "Below Reorder Level")
          .otherwise("Sufficient Stock"))
      .withColumn("DAY_DT", lit(java.sql.Date.valueOf(Entities.DayDtLit)))
      .select("DAY_DT", "PRODUCT_ID", "PRODUCT_NAME", "TOTAL_SALES_AMOUNT",
        "TOTAL_QUANTITY_SOLD", "AVG_SALE_PRICE", "STOCK_QUANTITY",
        "REORDER_LEVEL", "STOCK_LEVEL_STATUS", "PROFIT", "CATEGORY")
  }

  val oracle: String = Entities.sqlCtes + """
    |, joined AS (
    |  SELECT p.PRODUCT_ID, p.PRODUCT_NAME, p.CATEGORY, s.QUANTITY,
    |         p.SELLING_PRICE, p.COST_PRICE, p.STOCK_QUANTITY,
    |         CAST(s.QUANTITY AS DECIMAL(8,2)) * CAST(p.SELLING_PRICE AS DECIMAL(12,4)) AS SALES_AMOUNT,
    |         CAST(s.QUANTITY AS DECIMAL(8,2)) * (CAST(p.SELLING_PRICE AS DECIMAL(12,4)) - CAST(p.COST_PRICE AS DECIMAL(12,4))) AS PROFIT_AMOUNT
    |  FROM products p LEFT JOIN sales s ON p.PRODUCT_ID = s.PRODUCT_ID
    |), agg AS (
    |  SELECT PRODUCT_ID, PRODUCT_NAME, CATEGORY,
    |         SUM(QUANTITY) AS agg_QUANTITY,
    |         SUM(SALES_AMOUNT) AS agg_TOTAL_SALES_AMOUNT,
    |         SUM(CAST(SELLING_PRICE AS DECIMAL(12,4))) AS agg_PRICE_SUM,
    |         COUNT(SELLING_PRICE) AS agg_PRICE_CNT,
    |         SUM(PROFIT_AMOUNT) AS agg_PROFIT_AMOUNT
    |  FROM joined GROUP BY 1,2,3
    |)
    |SELECT DATE '2025-01-01' AS DAY_DT, a.PRODUCT_ID, a.PRODUCT_NAME,
    |       CAST(a.agg_TOTAL_SALES_AMOUNT AS DOUBLE) AS TOTAL_SALES_AMOUNT,
    |       CAST(a.agg_QUANTITY AS DOUBLE) AS TOTAL_QUANTITY_SOLD,
    |       CAST(a.agg_PRICE_SUM AS DOUBLE) / a.agg_PRICE_CNT AS AVG_SALE_PRICE,
    |       p.STOCK_QUANTITY, p.REORDER_LEVEL,
    |       CASE WHEN p.STOCK_QUANTITY <= p.REORDER_LEVEL THEN 'Below Reorder Level'
    |            ELSE 'Sufficient Stock' END AS STOCK_LEVEL_STATUS,
    |       CAST(a.agg_PROFIT_AMOUNT AS DOUBLE) AS PROFIT, a.CATEGORY
    |FROM agg a JOIN products p ON a.PRODUCT_ID = p.PRODUCT_ID
    |ORDER BY a.PRODUCT_ID""".stripMargin
}
