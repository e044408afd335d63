package graft

import org.apache.spark.sql.SaveMode
import graft.io.{Sinks, Sources}

/** S4/S5/S7/S10 exercised end-to-end against embedded Derby (shipped in
  * Spark's own jars) — no external RDBMS needed: sink modes, table
  * source, subquery pushdown, and the DDL side-channel all round-trip
  * through a real JDBC engine. */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  private def sample = Seq((1L, "alpha", 10.5), (2L, "beta", 20.25),
    (3L, "gamma", 30.0)).toDF("id", "name", "amount")

  test("S7 jdbc sink + S4 table source round-trip (overwrite then append)") {
    Sinks.jdbc(sample, url, "t_roundtrip", SaveMode.Overwrite, props)
    val back = Sources.jdbcTable(spark, url, "t_roundtrip", props)
    assert(back.orderBy("id").collect().map(_.toSeq).toSeq ==
      sample.orderBy("id").collect().map(_.toSeq).toSeq)
    // append accumulates; overwrite resets
    Sinks.jdbc(sample, url, "t_roundtrip", SaveMode.Append, props)
    assert(Sources.jdbcTable(spark, url, "t_roundtrip", props).count() == 6)
    Sinks.jdbc(sample, url, "t_roundtrip", SaveMode.Overwrite, props)
    assert(Sources.jdbcTable(spark, url, "t_roundtrip", props).count() == 3)
  }

  test("S5 subquery pushdown runs the subquery on the database side") {
    Sinks.jdbc(sample, url, "t_push", SaveMode.Overwrite, props)
    // Spark's JDBC writer creates quoted (case-exact) columns, so the
    // database-side subquery must quote them too (Derby folds unquoted
    // identifiers to uppercase)
    val out = Sources.jdbcQuery(spark,
      url, "SELECT \"id\", \"amount\" FROM t_push WHERE \"amount\" > 15", props)
    assert(out.columns.map(_.toLowerCase).toSeq == Seq("id", "amount"))
    assert(out.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
  }

  test("S10 DDL side-channel creates the schema before the load") {
    Sinks.jdbcWithPreDdl(sample, url, "graftwork.t_ddl", SaveMode.Overwrite,
      props, "CREATE SCHEMA graftwork")
    assert(Sources.jdbcTable(spark, url, "graftwork.t_ddl", props).count() == 3)
  }

  test("S4-scale partitioned read opens n disjoint strides, same results") {
    val wide = (1L to 100L).map(i => (i, s"row$i", i * 1.5))
      .toDF("id", "name", "amount")
    Sinks.jdbc(wide, url, "t_part", SaveMode.Overwrite, props)
    val back = Sources.jdbcTablePartitioned(
      spark, url, "t_part", "\"id\"", lo = 1L, hi = 101L, n = 4, props)
    assert(back.rdd.getNumPartitions == 4, "4 parallel JDBC strides")
    // each stride carries a disjoint quarter of the key range
    val perPart = back.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size)))
      .collect().toMap
    assert(perPart.values.sum == 100)
    assert(perPart.values.forall(_ == 25), s"even strides, got $perPart")
    // rows OUTSIDE [lo, hi) are still read (unbounded edge strides)
    val backNarrow = Sources.jdbcTablePartitioned(
      spark, url, "t_part", "\"id\"", lo = 40L, hi = 60L, n = 4, props)
    assert(backNarrow.count() == 100, "bounds steer strides, never filter")
  }
}
