package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the audit pass a pipeline runs before trusting a
  * new drop: per-column row/null/distinct counts and extrema, as one
  * tall (column, stats) table.
  *
  * Shape: a single aggregation over the input produces every column's
  * stats at once (multiple exact COUNT(DISTINCT)s plan as one Expand +
  * one shuffle — rows are replicated per profiled column, which is the
  * price of EXACT distincts; at 100 TB profile a column subset, or use
  * [[Approx.approxCountDistinct]] (HLL++, one scan, no Expand) when
  * ±2% is acceptable). The tall layout is produced by exploding an
  * in-row struct array AFTER aggregation — one row exists at that
  * point, so the explode is free and there is no second job per column.
  *
  * Extrema are reported as strings so one schema covers heterogeneous
  * column types; numeric formatting is delegated to the engine's CAST
  * — profile integral/string/date columns for cross-engine-stable
  * output, and keep float extrema out of differential comparisons.
  */
object Profile {

  /** `approxDistinct = true` swaps the exact COUNT(DISTINCT)s for
    * HLL++ (`approx_count_distinct`, relative standard deviation `rsd`):
    * the Expand — which replicates every input row once per profiled
    * column, the one part of this plan that hurts on a wide 100 TB
    * table — disappears, leaving a single one-pass aggregation. All
    * other stats stay exact; only n_distinct becomes an estimate
    * (deterministic for a fixed dataset, so regression tests can still
    * pin it). */
  def profile(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false,
              rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val structs: Seq[Column] = cols.map { c =>
      val distinct =
        if (approxDistinct) approx_count_distinct(col(c), rsd)
        else countDistinct(col(c))
      struct(
        lit(c).as("col_name"),
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col(c))).as("n_null"),
        distinct.as("n_distinct"),
        min(col(c)).cast("string").as("min_s"),
        max(col(c)).cast("string").as("max_s")).as(s"__$c")
    }
    df.agg(structs.head, structs.tail: _*)
      .select(explode(array(cols.map(c => col(s"__$c")): _*)).as("p"))
      .select("p.col_name", "p.n_rows", "p.n_null", "p.n_distinct",
        "p.min_s", "p.max_s")
  }

  /** The DuckDB-equivalent SQL (UNION ALL, one arm per column) for the
    * differential oracle of profile queries. */
  def oracleSql(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_null,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS VARCHAR) AS min_s,
         |  CAST(MAX($c) AS VARCHAR) AS max_s FROM $table""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  /** Per-GROUP profiling — [[profile]] sliced by a categorical key
    * (per-source / per-language / per-shard data audits): the same
    * single-aggregation + post-agg-explode shape, keyed by the group
    * column, so the output is |groups| × |cols| rows from ONE pass
    * (plus the Expand the exact distincts cost — same
    * `approxDistinct = true` escape hatch). NULL group keys form their
    * own group, SQL GROUP BY semantics. */
  def profileBy(df: DataFrame, groupCol: String, cols: Seq[String],
                approxDistinct: Boolean = false,
                rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(!cols.contains(groupCol), "group column cannot be profiled")
    val structs: Seq[Column] = cols.map { c =>
      val distinct =
        if (approxDistinct) approx_count_distinct(col(c), rsd)
        else countDistinct(col(c))
      struct(
        lit(c).as("col_name"),
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col(c))).as("n_null"),
        distinct.as("n_distinct"),
        min(col(c)).cast("string").as("min_s"),
        max(col(c)).cast("string").as("max_s")).as(s"__$c")
    }
    df.groupBy(col(groupCol))
      .agg(structs.head, structs.tail: _*)
      .select(col(groupCol),
        explode(array(cols.map(c => col(s"__$c")): _*)).as("p"))
      .select(col(groupCol), col("p.col_name"), col("p.n_rows"),
        col("p.n_null"), col("p.n_distinct"), col("p.min_s"), col("p.max_s"))
  }

  /** DuckDB-equivalent SQL for [[profileBy]]. */
  def oracleSqlBy(table: String, groupCol: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT $groupCol, '$c' AS col_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_null,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS VARCHAR) AS min_s,
         |  CAST(MAX($c) AS VARCHAR) AS max_s FROM $table GROUP BY $groupCol"""
        .stripMargin
    }.mkString("", "\nUNION ALL\n", s"\nORDER BY $groupCol, col_name")
}
