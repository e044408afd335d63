package graft.ops

import org.apache.spark.sql.DataFrame
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

    // align schemas for the union by NAME, with missing columns filled by
    // nulls typed from the side that has them (untyped NullType would lean
    // on union coercion; expression-valued Columns would not round-trip)
    val allNames: Seq[String] =
      keys ++ leftCols.filterNot(keys.contains) ++
        rightPayload.map(c => s"$rightPrefix$c") ++ Seq("__t", "__side")
    val types: Map[String, org.apache.spark.sql.types.DataType] =
      (taggedLeft.schema ++ taggedRight.schema).map(f => f.name -> f.dataType).toMap
    def aligned(df: DataFrame): DataFrame = {
      val present = df.columns.toSet
      df.select(allNames.map(n =>
        if (present(n)) col(n) else lit(null).cast(types(n)).as(n)): _*)
    }
    val unioned = aligned(taggedLeft).unionByName(aligned(taggedRight))

    // at equal times: non-strict sees the right row (right side=0 sorts
    // first, ascending), strict does not (left sorts first, descending)
    val sideOrder = if (strict) col("__side").desc else col("__side").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // fill ONE struct of the whole right payload, not each column
    // independently: per-column last(ignoreNulls) would let a null field
    // skip back to an OLDER right row than its siblings, producing an
    // output row that corresponds to no actual right row. The struct is
    // non-null exactly on right-side rows, so null fields travel with
    // their row (ASOF LEFT returns the matched row including its nulls).
    val payloadStruct = when(col("__side") === 0,
      struct(rightPayload.map(c => col(s"$rightPrefix$c")): _*))
    val filled = unioned
      .withColumn("__r", last(payloadStruct, ignoreNulls = true).over(w))
    rightPayload.foldLeft(filled) { (df, c) =>
      df.withColumn(s"$rightPrefix$c", col("__r").getField(s"$rightPrefix$c"))
    }.filter(col("__side") === 1).drop("__t", "__side", "__r")
  }
}
