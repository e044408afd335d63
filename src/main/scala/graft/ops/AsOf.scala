package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark lacks natively (build-brief preference
  * order (a): composed from existing operators, since the semantics ARE
  * expressible): for each left row, attach the single latest right row of
  * the same key whose time is ≤ (or < when `strict`) the left row's time.
  *
  * Implementation is the UNION-WINDOW form, not a range join: tag both
  * sides, union, and run `last(right_col, ignoreNulls)` over a window
  * partitioned by key and ordered by (time, side) up to the current row.
  * One shuffle by key, no pair explosion — at 100 TB this is the only
  * shape that survives (a theta/range join materializes every candidate
  * pair; the union-window moves each row exactly once). Left rows with no
  * earlier right row get nulls (ASOF LEFT semantics, matching DuckDB).
  *
  * Tie contract: right rows must be unique per (keys, time) — the
  * standard as-of precondition (enforceable upstream with
  * [[Quality.gate]]).
  */
object AsOf {

  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               strict: Boolean = false,
               rightPrefix: String = "asof_"): DataFrame = {
    val rightPayload = right.columns.filterNot(keys.contains).toSeq
    val leftCols = left.columns.toSeq

    val taggedLeft = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val taggedRight = rightPayload
      .foldLeft(right) { (df, c) => df.withColumnRenamed(c, s"$rightPrefix$c") }
      .withColumn("__t", col(s"$rightPrefix$rightTime"))
      .withColumn("__side", lit(0))

    // align schemas for the union
    val allCols =
      keys.map(col) ++
        leftCols.filterNot(keys.contains).map(c => col(c)) ++
        rightPayload.map(c => col(s"$rightPrefix$c")) ++
        Seq(col("__t"), col("__side"))
    val l = taggedLeft
      .select(allCols.map(c => tryCol(taggedLeft, c)): _*)
    val r = taggedRight
      .select(allCols.map(c => tryCol(taggedRight, c)): _*)
    val unioned = l.unionByName(r)

    // at equal times: non-strict sees the right row (right side=0 sorts
    // first, ascending), strict does not (left sorts first, descending)
    val sideOrder = if (strict) col("__side").desc else col("__side").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightPayload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"$rightPrefix$c",
        last(col(s"$rightPrefix$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__t", "__side")
  }

  /** Column if present on the frame, else a typed null placeholder. */
  private def tryCol(df: DataFrame, c: Column): Column = {
    val name = c.toString
    if (df.columns.contains(name)) col(name)
    else lit(null).as(name)
  }
}
