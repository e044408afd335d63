package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the generalization of the
  * reference's single duplicate gate ([[Quality]], reference
  * `ETL_Airflow/dags/utils.py:78-86`) into a rule suite a load can
  * declare once and evaluate cheaply: not-null, accepted-set, range,
  * regex-match, uniqueness, and referential integrity, reported as one
  * (rule, violations, checked) table.
  *
  * Scale posture: every ROW-LOCAL rule (not-null / in-set / in-range /
  * regex) is a `sum(when(...))` branch inside ONE aggregation — a single
  * scan with map-side partials regardless of how many such rules the
  * suite declares, never a pass per rule. Uniqueness is one keyed
  * aggregation (the [[Quality.duplicates]] shape) that ships only
  * per-key counts > 1; referential integrity is one left-anti join per
  * named dimension (broadcast when the dim is small — Catalyst/AQE's
  * call). Rules never materialize offending ROWS into the report —
  * counts only, so the report is O(#rules); use [[violatingRows]] for
  * the drill-down sample.
  */
object Expectations {

  /** One declared expectation. `name` keys the report row. */
  sealed trait Rule { def name: String }
  /** `col` must never be null. */
  final case class NotNull(name: String, col: String) extends Rule
  /** Non-null values of `col` must be in `allowed`. */
  final case class InSet(name: String, col: String, allowed: Seq[String])
    extends Rule
  /** Non-null values of `col` must lie in [lo, hi]. */
  final case class InRange(name: String, col: String, lo: Double, hi: Double)
    extends Rule
  /** Non-null values of `col` must match the (Java) regex in full. */
  final case class Matches(name: String, col: String, regex: String)
    extends Rule
  /** The column list must be a candidate key (no duplicate groups);
    * violations = number of rows IN EXCESS of one per key. */
  final case class Unique(name: String, cols: Seq[String]) extends Rule
  /** Every non-null `col` value must exist in `dim`'s `dimCol`;
    * violations = rows whose key is absent. */
  final case class RefIntegrity(name: String, col: String, dim: DataFrame,
                                dimCol: String) extends Rule

  private def rowLocalViolation(r: Rule): Option[Column] = r match {
    case NotNull(_, c) => Some(col(c).isNull)
    case InSet(_, c, allowed) =>
      Some(col(c).isNotNull && !col(c).isin(allowed: _*))
    case InRange(_, c, lo, hi) =>
      Some(col(c).isNotNull && (col(c) < lo || col(c) > hi))
    case Matches(_, c, re) =>
      Some(col(c).isNotNull && !col(c).rlike("^(?:" + re + ")$"))
    case _ => None
  }

  /** Evaluate the suite; returns one row per rule:
    * (rule, violations, checked) where `checked` is the total row count
    * for row-local rules and uniqueness, and the non-null probe count
    * for referential rules. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "empty expectation suite")
    require(rules.map(_.name).distinct.size == rules.size,
      "duplicate rule names in the suite")
    val spark = df.sparkSession
    import spark.implicits._

    val rowLocal = rules.flatMap(r => rowLocalViolation(r).map(r.name -> _))
    // ONE pass for every row-local rule + the shared total
    val localReport: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        val aggs = rowLocal.map { case (n, v) =>
          sum(when(v, 1L).otherwise(0L)).as(s"v_$n")
        } :+ count(lit(1)).as("__total")
        val one = df.agg(aggs.head, aggs.tail: _*)
        Some(one.select(explode(array(rowLocal.map { case (n, _) =>
          struct(lit(n).as("rule"), col(s"v_$n").as("violations"),
            col("__total").as("checked"))
        }: _*)).as("r")).select("r.*"))
      }

    val keyed = rules.collect {
      case Unique(n, cols0) =>
        val dups = df.groupBy(cols0.map(col): _*)
          .agg(count(lit(1)).as("cnt"))
        dups.agg(
          coalesce(sum(when(col("cnt") > 1, col("cnt") - 1)), lit(0L))
            .as("violations"),
          coalesce(sum(col("cnt")), lit(0L)).as("checked"))
          .select(lit(n).as("rule"), col("violations"), col("checked"))
      case RefIntegrity(n, c, dim, dimCol) =>
        val probe = df.select(col(c)).filter(col(c).isNotNull)
        val missing = probe.join(dim.select(col(dimCol).as(c)).distinct(),
          Seq(c), "left_anti")
        missing.agg(count(lit(1)).as("violations"))
          .crossJoin(probe.agg(count(lit(1)).as("checked")))
          .select(lit(n).as("rule"), col("violations"), col("checked"))
    }

    (localReport.toSeq ++ keyed)
      .reduce(_.unionByName(_))
  }

  /** Throw when any rule reports violations (the [[Quality.gate]]
    * composition contract: returns `df` unchanged when clean). */
  def gate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val bad = check(df, rules).filter(col("violations") > 0)
      .select("rule").collect().map(_.getString(0))
    if (bad.nonEmpty)
      throw new DuplicateException(
        s"Expectations failed: ${bad.mkString(", ")}")
    df
  }

  /** Drill-down: rows violating any ROW-LOCAL rule, with the list of
    * rule names each row failed (keyed/referential rules report counts
    * only — their offenders are keys, not rows). */
  def violatingRows(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val rowLocal = rules.flatMap(r => rowLocalViolation(r).map(r.name -> _))
    require(rowLocal.nonEmpty, "no row-local rules in the suite")
    val tags = array(rowLocal.map { case (n, v) =>
      when(v, lit(n))
    }: _*)
    df.withColumn("failed_rules", filter(tags, _.isNotNull))
      .filter(size(col("failed_rules")) > 0)
  }
}
