package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.model.Entities
import graft.ops.Reconcile

/** Driver-facing reconciliation queries: the Raptor diff operator
  * ([[graft.ops.Reconcile]]) exercised on `orders` vs a deterministically
  * perturbed copy of itself (FIXTURES.md §C last row — "table vs itself
  * with injected perturbations"), so the DuckDB oracle can rebuild the
  * exact same source/target pair:
  *
  *   - keys `o_orderkey % 17 == 5` are dropped from target (source-extra)
  *   - `o_totalprice + 1` where `o_orderkey % 10 == 3` (value mismatch)
  *   - `o_orderpriority = 'PERTURBED'` where `o_orderkey % 20 == 7`
  *   - synthetic keys `o_orderkey + 10000000` where `% 13 == 2` are added
  *     to target (target-extra)
  *
  * o_totalprice is pre-cast to DECIMAL(12,2) on both sides because record
  * canonicalization stringifies every column and Spark's and DuckDB's
  * DOUBLE→VARCHAR formats differ; DECIMAL→VARCHAR agrees.
  */
object ReconcileQueries {

  val Keys = Seq("o_orderkey")

  def source(spark: SparkSession, dir: String): DataFrame =
    Entities.read(spark, dir, "orders").select(
      col("o_orderkey"),
      col("o_orderstatus"),
      col("o_orderpriority"),
      col("o_totalprice").cast(DecimalType(12, 2)).as("o_totalprice"))

  def target(spark: SparkSession, dir: String): DataFrame = {
    val s = source(spark, dir)
    val perturbed = s
      .filter(col("o_orderkey") % 17 =!= 5)
      .select(
        col("o_orderkey"),
        col("o_orderstatus"),
        when(col("o_orderkey") % 20 === 7, "PERTURBED")
          .otherwise(col("o_orderpriority")).as("o_orderpriority"),
        when(col("o_orderkey") % 10 === 3, col("o_totalprice") + 1)
          .otherwise(col("o_totalprice")).as("o_totalprice"))
    val extras = s.filter(col("o_orderkey") % 13 === 2).select(
      (col("o_orderkey") + 10000000).as("o_orderkey"),
      lit("X").as("o_orderstatus"),
      lit("EXTRA").as("o_orderpriority"),
      lit(new java.math.BigDecimal("1.00")).cast(DecimalType(12, 2)).as("o_totalprice"))
    perturbed.unionAll(extras)
  }

  def rowDiff(spark: SparkSession, dir: String): DataFrame =
    Reconcile.rowDiff(source(spark, dir), target(spark, dir), Keys)

  def colMismatch(spark: SparkSession, dir: String): DataFrame =
    Reconcile.colMismatch(source(spark, dir), target(spark, dir), Keys)

  def srcExtra(spark: SparkSession, dir: String): DataFrame =
    Reconcile.srcExtra(source(spark, dir), target(spark, dir), Keys)

  def tgtExtra(spark: SparkSession, dir: String): DataFrame =
    Reconcile.tgtExtra(source(spark, dir), target(spark, dir), Keys)

  def summary(spark: SparkSession, dir: String): DataFrame =
    Reconcile.summary(source(spark, dir), target(spark, dir), Keys)

  def colSummary(spark: SparkSession, dir: String): DataFrame =
    Reconcile.colSummary(source(spark, dir), target(spark, dir), Keys)

  /** Shared oracle CTEs: perturbation + canonical records on both sides. */
  private val baseCtes: String =
    """WITH src AS (
      |  SELECT o_orderkey, o_orderstatus, o_orderpriority,
      |         CAST(o_totalprice AS DECIMAL(12,2)) AS o_totalprice
      |  FROM orders
      |), tgt AS (
      |  SELECT o_orderkey, o_orderstatus,
      |         CASE WHEN o_orderkey % 20 = 7 THEN 'PERTURBED' ELSE o_orderpriority END AS o_orderpriority,
      |         CASE WHEN o_orderkey % 10 = 3 THEN CAST(o_totalprice AS DECIMAL(12,2)) + 1
      |              ELSE CAST(o_totalprice AS DECIMAL(12,2)) END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 17 <> 5
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, 'X', 'EXTRA', CAST(1.00 AS DECIMAL(12,2))
      |  FROM orders WHERE o_orderkey % 13 = 2
      |), srec AS (
      |  SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey, concat_ws(chr(1),
      |    COALESCE(CAST(o_orderkey AS VARCHAR),''), COALESCE(CAST(o_orderstatus AS VARCHAR),''),
      |    COALESCE(CAST(o_orderpriority AS VARCHAR),''), COALESCE(CAST(o_totalprice AS VARCHAR),'')) AS Source_Record
      |  FROM src
      |), trec AS (
      |  SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey, concat_ws(chr(1),
      |    COALESCE(CAST(o_orderkey AS VARCHAR),''), COALESCE(CAST(o_orderstatus AS VARCHAR),''),
      |    COALESCE(CAST(o_orderpriority AS VARCHAR),''), COALESCE(CAST(o_totalprice AS VARCHAR),'')) AS Target_Record
      |  FROM tgt
      |)""".stripMargin

  val rowDiffOracle: String = baseCtes + """
    |SELECT s.o_orderkey, s.Source_Record, t.Target_Record
    |FROM srec s JOIN trec t ON s.o_orderkey = t.o_orderkey
    |WHERE s.Source_Record <> t.Target_Record
    |ORDER BY s.o_orderkey""".stripMargin

  val colMismatchOracle: String = baseCtes + """
    |, rowdiff AS (
    |  SELECT s.o_orderkey, s.Source_Record, t.Target_Record
    |  FROM srec s JOIN trec t ON s.o_orderkey = t.o_orderkey
    |  WHERE s.Source_Record <> t.Target_Record
    |), exploded AS (
    |  SELECT r.o_orderkey,
    |         string_split(r.Source_Record, chr(1))[u.i] AS source_value,
    |         string_split(r.Target_Record, chr(1))[u.i] AS target_value,
    |         ['o_orderkey','o_orderstatus','o_orderpriority','o_totalprice'][u.i] AS mismatch_column_name
    |  FROM rowdiff r CROSS JOIN (SELECT UNNEST([1,2,3,4]) AS i) u
    |)
    |SELECT o_orderkey, source_value, target_value, mismatch_column_name
    |FROM exploded WHERE source_value <> target_value
    |ORDER BY o_orderkey, mismatch_column_name""".stripMargin

  val srcExtraOracle: String = baseCtes + """
    |SELECT s.o_orderkey, s.Source_Record
    |FROM srec s LEFT JOIN trec t ON s.o_orderkey = t.o_orderkey
    |WHERE t.Target_Record IS NULL ORDER BY s.o_orderkey""".stripMargin

  val tgtExtraOracle: String = baseCtes + """
    |SELECT t.o_orderkey, t.Target_Record
    |FROM srec s RIGHT JOIN trec t ON s.o_orderkey = t.o_orderkey
    |WHERE s.Source_Record IS NULL ORDER BY t.o_orderkey""".stripMargin

  val summaryOracle: String = baseCtes + """
    |, j AS (
    |  SELECT s.Source_Record, t.Target_Record
    |  FROM srec s FULL OUTER JOIN trec t ON s.o_orderkey = t.o_orderkey
    |), a AS (
    |  SELECT COUNT(Source_Record) AS src_cnt, COUNT(Target_Record) AS tgt_cnt,
    |         COUNT(CASE WHEN Source_Record IS NOT NULL AND Target_Record IS NOT NULL THEN 1 END) AS common_cnt,
    |         COUNT(CASE WHEN Source_Record IS NOT NULL AND Target_Record IS NOT NULL AND Source_Record <> Target_Record THEN 1 END) AS mismatch_cnt,
    |         COUNT(CASE WHEN Target_Record IS NULL THEN 1 END) AS src_extra_cnt,
    |         COUNT(CASE WHEN Source_Record IS NULL THEN 1 END) AS tgt_extra_cnt
    |  FROM j
    |)
    |SELECT Description, Value FROM (
    |  SELECT 'Number of rows in Source' AS Description, CAST(src_cnt AS VARCHAR) AS Value FROM a
    |  UNION ALL SELECT 'Number of rows in Target', CAST(tgt_cnt AS VARCHAR) FROM a
    |  UNION ALL SELECT 'Number of rows in common', CAST(common_cnt AS VARCHAR) FROM a
    |  UNION ALL SELECT 'Number of rows mismatch', CAST(mismatch_cnt AS VARCHAR) FROM a
    |  UNION ALL SELECT 'Row Mismatch Percentage',
    |    CASE WHEN common_cnt > 0 THEN CAST(CAST(mismatch_cnt * 100.0 / common_cnt AS DECIMAL(10,2)) AS VARCHAR) || '%' END FROM a
    |  UNION ALL SELECT 'Number of rows in Source but not in Target', CAST(src_extra_cnt AS VARCHAR) FROM a
    |  UNION ALL SELECT 'Number of rows in Target but not in Source', CAST(tgt_extra_cnt AS VARCHAR) FROM a
    |) ORDER BY Description""".stripMargin

  val colSummaryOracle: String = baseCtes + """
    |, rowdiff AS (
    |  SELECT s.o_orderkey, s.Source_Record, t.Target_Record
    |  FROM srec s JOIN trec t ON s.o_orderkey = t.o_orderkey
    |  WHERE s.Source_Record <> t.Target_Record
    |), exploded AS (
    |  SELECT r.o_orderkey,
    |         string_split(r.Source_Record, chr(1))[u.i] AS source_value,
    |         string_split(r.Target_Record, chr(1))[u.i] AS target_value,
    |         ['o_orderkey','o_orderstatus','o_orderpriority','o_totalprice'][u.i] AS mismatch_column_name
    |  FROM rowdiff r CROSS JOIN (SELECT UNNEST([1,2,3,4]) AS i) u
    |), mism AS (
    |  SELECT mismatch_column_name, COUNT(*) AS Mismatch_Record_Count_Column_Level
    |  FROM exploded WHERE source_value <> target_value GROUP BY 1
    |), cmp AS (
    |  SELECT COUNT(*) AS compared_cnt FROM srec s JOIN trec t ON s.o_orderkey = t.o_orderkey
    |)
    |SELECT m.mismatch_column_name, m.Mismatch_Record_Count_Column_Level,
    |       CAST(CAST(m.Mismatch_Record_Count_Column_Level * 100.0 / c.compared_cnt AS DECIMAL(10,2)) AS VARCHAR) || '%' AS Percentage_Of_Mismatch
    |FROM mism m CROSS JOIN cmp c
    |ORDER BY m.Mismatch_Record_Count_Column_Level * 1.0 / c.compared_cnt DESC,
    |         m.mismatch_column_name""".stripMargin
}
