package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Typed failure raised by the duplicate gate — mirrors the reference's
  * `DuplicateException` (reference: `ETL_Airflow/dags/utils.py:73-76`). */
class DuplicateException(message: String) extends Exception(message)

/** Data-quality gates — re-expression of the reference's `Duplicate_check`
  * (reference: `ETL_Airflow/dags/utils.py:78-86`), which groups by the
  * primary-key list, counts, and raises if any group exceeds 1. The gate
  * runs before every load in the reference (gate-then-write ordering,
  * SURVEY.md §7.5 item 5).
  *
  * Scale posture: the check is a keyed aggregation (map-side partial
  * count → shuffle by key) followed by `isEmpty`, which only has to find
  * one offending group — Spark stops at the first non-empty partition
  * rather than materializing all counts.
  */
object Quality {

  /** Groups with more than one row per primary key (empty ⇒ clean). */
  def duplicates(df: DataFrame, primaryKey: Seq[String]): DataFrame =
    df.groupBy(primaryKey.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  /** Throws [[DuplicateException]] when `df` has duplicate primary keys;
    * otherwise returns `df` unchanged so the gate composes with a write:
    * `Sinks.append(Quality.gate(df, keys), ...)`. */
  def gate(df: DataFrame, primaryKey: Seq[String]): DataFrame = {
    if (!duplicates(df, primaryKey).isEmpty)
      throw new DuplicateException(
        s"Found duplicates in columns: ${primaryKey.mkString(", ")}")
    df
  }
}
