package graft

import graft.pipelines.Dag

class DagSpec extends SparkSpec {

  test("runAll lands every stage with raw+legacy snapshots, in order") {
    val out = java.nio.file.Files.createTempDirectory("graft_dag_").toString
    val results = Dag.runAll(spark, sf, out)
    assert(results.map(_.name) == Seq("suppliers", "products", "customers",
      "sales", "supplier_performance", "product_performance",
      "customer_sales_report"))
    results.foreach { r =>
      assert(r.rows > 0, s"${r.name} landed no rows")
      assert(spark.read.parquet(r.path).count() == r.rows)
      val legacy = r.path.replace("/raw/", "/legacy/")
      assert(spark.read.parquet(legacy).count() == r.rows)
    }
    // running again: raw unchanged, legacy doubles (the snapshot ledger)
    val again = Dag.runAll(spark, sf, out)
    again.foreach { r =>
      assert(spark.read.parquet(r.path).count() == r.rows)
      val legacy = r.path.replace("/raw/", "/legacy/")
      assert(spark.read.parquet(legacy).count() == 2 * r.rows)
    }
  }

  test("runUsaEtl lands the second DAG's single stage, gated and snapshotted") {
    val out = java.nio.file.Files.createTempDirectory("graft_usa_").toString
    val r = Dag.runUsaEtl(spark, sf, out)
    assert(r.name == "usa_population")
    assert(r.rows > 0)
    assert(spark.read.parquet(r.path).count() == r.rows)
    assert(spark.read.parquet(r.path.replace("/raw/", "/legacy/")).count() == r.rows)
    assert(spark.read.parquet(r.path).columns.toSeq == Seq("ID_NATION",
      "NATION", "ID_YEAR", "YEAR", "POPULATION", "SLUG_NATION"))
  }

  test("the sale grain would fail a SALE_ID gate (fixture plants dups)") {
    intercept[graft.ops.DuplicateException] {
      graft.ops.Quality.gate(
        graft.model.Entities.sales(spark, sf), Seq("SALE_ID")).count()
    }
  }
}
