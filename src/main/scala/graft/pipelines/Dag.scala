package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.io.Sinks
import graft.ops.Quality

/** The reference's production DAG as plain call sequencing — SURVEY.md
  * §2.13: Airflow's task graph
  * (`dags/metamorph_etl_dag.py:28`:
  * `[suppliers, products, customers] >> sales >> supplier_performance >>
  * product_performance >> customer_sales_report`)
  * reduces to ordinary function composition once every task is a pure
  * `(SparkSession, dir) => DataFrame`. Each mart load preserves the
  * reference's gate-then-write ordering (a duplicate-key failure means
  * no partial load).
  *
  * Retry/backoff, scheduling, and alerting stay with whatever runs the
  * driver (cron, Airflow's SparkSubmitOperator, …) — they are not engine
  * concerns.
  */
object Dag {

  final case class StageResult(name: String, rows: Long, path: String)

  /** Run the full pipeline against `sfDir`, landing every output under
    * `outDir` with the raw/legacy snapshot convention. Returns per-stage
    * row counts in execution order. */
  def runAll(spark: SparkSession, sfDir: String, outDir: String): Seq[StageResult] = {

    def load(name: String, df: DataFrame, pk: Option[Seq[String]]): StageResult = {
      val gated = pk.fold(df)(Quality.gate(df, _))
      Sinks.snapshot(gated, s"$outDir/raw/$name", s"$outDir/legacy/$name")
      StageResult(name, gated.count(), s"$outDir/raw/$name")
    }

    // ingestion fan-in (the reference's three parallel ingests + sales).
    // The sale grain is UNGATED by design: the driver fixture plants
    // duplicate (orderkey, linenumber) pairs, so a SALE_ID gate correctly
    // throws (QualitySpec/DagSpec assert that) — the reference would fail
    // this load too; the dirty grain is the fixture's dup-detection bait.
    val ingestion = Seq(
      load("suppliers", Ingestion.suppliersSnapshot(spark, sfDir), Some(Seq("SUPPLIER_ID"))),
      load("products", graft.model.Entities.products(spark, sfDir), Some(Seq("PRODUCT_ID"))),
      load("customers", graft.model.Entities.customers(spark, sfDir), Some(Seq("CUSTOMER_ID"))),
      load("sales", graft.model.Entities.sales(spark, sfDir), None))

    // marts, in the reference's dependency order
    val marts = Seq(
      load("supplier_performance", SupplierPerformance(spark, sfDir),
        Some(Seq("SUPPLIER_ID", "DAY_DT"))),
      load("product_performance", ProductPerformance(spark, sfDir),
        Some(Seq("PRODUCT_ID", "DAY_DT"))),
      load("customer_sales_report", CustomerSalesReport(spark, sfDir), None))

    ingestion ++ marts
  }

  /** The reference's SECOND production DAG (`dags/usa_etl_dag.py:6-10`,
    * one task: `usa_population_ingestion.py:20-56`) — canonicalize + gate
    * via [[Ingestion.usaPopulation]], landed with the same raw/legacy
    * snapshot convention as [[runAll]]'s stages. */
  def runUsaEtl(spark: SparkSession, sfDir: String, outDir: String): StageResult = {
    val gated = Ingestion.usaPopulationSnapshot(spark, sfDir)
    Sinks.snapshot(gated, s"$outDir/raw/usa_population", s"$outDir/legacy/usa_population")
    StageResult("usa_population", gated.count(), s"$outDir/raw/usa_population")
  }
}
