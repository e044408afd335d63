package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Canonical business entities, re-expressed over the driver's TPC-H-ish
  * parquet fixtures (`/root/testdata/sf*`), mirroring the reference's
  * post-ingest canonical schemas (reference: `ETL_Airflow/dags/tasks/
  * ingestion_task.py:32-59,97-118,174-191,246-273` — UPPER_SNAKE columns).
  *
  * Entity mapping follows FIXTURES.md §C:
  *   suppliers → supplier, products → part, customers → customer,
  *   sales → lineitem ⋈ orders.
  *
  * Determinism notes (important for the DuckDB oracle):
  *   - The reference stamps `DAY_DT = current_date()`; we inject a fixed
  *     clock ([[Entities.DayDt]]) so result hashes are reproducible
  *     (SURVEY.md §7.5 item 2).
  *   - Money math is done in DECIMAL(18,4) (exact, order-independent
  *     aggregation) and cast to DOUBLE only in final projections, so
  *     Spark and DuckDB produce bit-identical results regardless of
  *     partial-aggregation order. At 100 TB this also avoids the
  *     nondeterministic float-sum problem across 1000 executors.
  */
object Entities {

  /** Injected clock replacing the reference's `current_date()`. */
  val DayDtLit = "2025-01-01"
  /** Injected clock replacing the reference's `current_timestamp()`. */
  val LoadTstmpLit = "2025-01-01 00:00:00"

  /** DECIMAL types for exact money arithmetic. Precisions are deliberately
    * tight: decimal multiplication adds precisions (p1+p2+1), and once a
    * product exceeds precision 38 Spark and DuckDB apply *different*
    * precision-loss rules — keeping every intermediate under 38 keeps both
    * engines exact and therefore bit-identical. Quantities are ≤ 5 digits,
    * prices ≤ 8 digits with ≤4 decimals, discounts ≤ 4 decimals. */
  val QtyDec: DecimalType = DecimalType(8, 2)
  val Money: DecimalType = DecimalType(12, 4)
  val DiscDec: DecimalType = DecimalType(8, 4)

  def decQ(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = c.cast(QtyDec)
  def dec(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = c.cast(Money)
  def decD(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = c.cast(DiscDec)

  // Per-(session, path) memo of the base parquet frames: every
  // `spark.read.parquet` call costs a footer/schema-listing job plus a
  // fresh analysis of the relation, and the mart pipelines re-read the
  // same 4 tables on every invocation (4 × ~35 ms of jobs per apply()
  // at bench cadence). DataFrames are immutable plans, so sharing one
  // per (session, path) is safe. Residency is a BOUNDED LRU — a weak
  // session key would be illusory here because each memoized Dataset
  // strongly references its own session (the CacheWindows scaladoc
  // documents the same trap), so eviction is what actually frees a
  // stopped session's plans; 64 entries cover many sessions × the
  // fixture tables, and an evicted entry just re-lists on next use.
  // The key carries the path's LAST-MODIFIED time, so a rewrite of the
  // parquet directory during a live session gets a FRESH file listing /
  // schema snapshot on next read instead of a stale memoized frame (the
  // stale entry ages out of the LRU). One filesystem stat per call —
  // microseconds against the ~35 ms listing job the memo avoids.
  // KNOWN COVERAGE BOUNDS of the mtime key (deliberate, ADVICE r14): a
  // rewrite landing in the SAME millisecond as the memoized listing, or
  // one that rewrites part-file BYTES without creating/deleting any
  // directory entry (dir mtime unchanged), still serves the memoized
  // frame; a stat failure maps all error cases onto the shared mtime=0
  // key. Spark's own writers always create/delete entries (temp dirs,
  // _SUCCESS), so every fixture/driver rewrite bumps the dir mtime; a
  // listing digest (names+sizes+mtimes) would close the residual gap at
  // a per-call directory-walk cost that grows with part-file count —
  // wrong trade for an engine whose inputs are immutable-at-scale.
  private val readMemo =
    new java.util.LinkedHashMap[(SparkSession, String, Long), DataFrame](
      16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String, Long), DataFrame])
          : Boolean = size() > 64
    }
  def read(spark: SparkSession, dir: String, table: String): DataFrame =
    readMemo.synchronized {
      val path = s"$dir/$table.parquet"
      val mtime =
        try java.nio.file.Files.getLastModifiedTime(
          java.nio.file.Paths.get(path)).toMillis
        catch { case _: Throwable => 0L } // non-local/missing: memo on path
      val key = (spark, path, mtime)
      val hit = readMemo.get(key)
      if (hit != null) hit
      else {
        val df = spark.read.parquet(path)
        readMemo.put(key, df)
        df
      }
    }

  /** suppliers (reference `raw.suppliers_pre`): SUPPLIER_ID, SUPPLIER_NAME.
    * Fixture: `supplier` (s_suppkey 0-based, 10 rows at sf0.001). */
  def suppliers(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "supplier").select(
      col("s_suppkey").as("SUPPLIER_ID"),
      col("s_name").as("SUPPLIER_NAME"))

  /** products (reference `raw.products_pre`, 8 canonical columns incl. the
    * split selling/cost prices — `ingestion_task.py:97-118`).
    * Fixture derivations per FIXTURES.md §C: COST_PRICE = retail*0.8,
    * STOCK_QUANTITY = p_size*10, REORDER_LEVEL = p_size,
    * SUPPLIER_ID = p_partkey % 10 (deterministic FK onto s_suppkey 0-9). */
  def products(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "part").select(
      col("p_partkey").as("PRODUCT_ID"),
      col("p_name").as("PRODUCT_NAME"),
      col("p_type").as("CATEGORY"),
      col("p_retailprice").as("SELLING_PRICE"),
      (col("p_retailprice") * lit(0.8)).as("COST_PRICE"),
      (col("p_size") * lit(10)).as("STOCK_QUANTITY"),
      col("p_size").as("REORDER_LEVEL"),
      (col("p_partkey") % 10).as("SUPPLIER_ID"))

  /** customers (reference `raw.customers_pre`): CUSTOMER_ID, NAME, CITY
    * (`ingestion_task.py:174-191`; c_mktsegment stands in for city). */
  def customers(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "customer").select(
      col("c_custkey").as("CUSTOMER_ID"),
      col("c_name").as("NAME"),
      col("c_mktsegment").as("CITY"))

  /** sales (reference `raw.sales_pre`, schema from positional renames at
    * `ingestion_task.py:246-255`): SALE_ID, CUSTOMER_ID, PRODUCT_ID,
    * SALE_DATE, QUANTITY, DISCOUNT, ORDER_STATUS.
    *
    * Fixture: lineitem ⋈ orders on the order key. SALE_ID is the composite
    * (l_orderkey, l_linenumber) packed as `l_orderkey*10 + l_linenumber`
    * (l_linenumber ∈ 1..7). ORDER_STATUS maps the fixture's single-char
    * o_orderstatus onto the reference's vocabulary
    * ('F'→Delivered, 'O'→Shipped, 'P'→Cancelled).
    *
    * Scale note: this is the one big-big join of the model (lineitem ⋈
    * orders on l_orderkey). Both sides arrive clustered by orderkey in
    * TPC-H-style data; at 100 TB you'd bucket both tables by the order key
    * so this join is shuffle-free. Catalyst handles the small-SF case.
    */
  def sales(spark: SparkSession, dir: String): DataFrame = {
    val li = read(spark, dir, "lineitem")
    val o  = read(spark, dir, "orders")
    li.join(o, li("l_orderkey") === o("o_orderkey"), "inner").select(
      (col("l_orderkey") * 10 + col("l_linenumber")).cast("long").as("SALE_ID"),
      col("o_custkey").as("CUSTOMER_ID"),
      col("l_partkey").as("PRODUCT_ID"),
      col("l_suppkey").as("SHIP_SUPPLIER_ID"),
      col("l_shipdate").as("SALE_DATE"),
      col("l_quantity").as("QUANTITY"),
      col("l_discount").as("DISCOUNT"),
      when(col("o_orderstatus") === "F", "Delivered")
        .when(col("o_orderstatus") === "O", "Shipped")
        .otherwise("Cancelled").as("ORDER_STATUS"))
  }

  /** The same canonical entities as DuckDB CTEs, shared by every oracle SQL
    * string so the oracle sees byte-identical semantics. */
  val sqlCtes: String =
    """WITH suppliers AS (
      |  SELECT s_suppkey AS SUPPLIER_ID, s_name AS SUPPLIER_NAME FROM supplier
      |), products AS (
      |  SELECT p_partkey AS PRODUCT_ID, p_name AS PRODUCT_NAME, p_type AS CATEGORY,
      |         p_retailprice AS SELLING_PRICE, p_retailprice * 0.8 AS COST_PRICE,
      |         p_size * 10 AS STOCK_QUANTITY, p_size AS REORDER_LEVEL,
      |         p_partkey % 10 AS SUPPLIER_ID
      |  FROM part
      |), customers AS (
      |  SELECT c_custkey AS CUSTOMER_ID, c_name AS NAME, c_mktsegment AS CITY FROM customer
      |), sales AS (
      |  SELECT l_orderkey*10 + l_linenumber AS SALE_ID, o_custkey AS CUSTOMER_ID,
      |         l_partkey AS PRODUCT_ID, l_suppkey AS SHIP_SUPPLIER_ID,
      |         l_shipdate AS SALE_DATE, l_quantity AS QUANTITY, l_discount AS DISCOUNT,
      |         CASE o_orderstatus WHEN 'F' THEN 'Delivered' WHEN 'O' THEN 'Shipped' ELSE 'Cancelled' END AS ORDER_STATUS
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |)""".stripMargin
}
