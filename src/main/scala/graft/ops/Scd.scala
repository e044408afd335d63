package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension (SCD2) merge — the warehouse-ETL
  * pattern for versioned dimension history: instead of overwriting a
  * changed dimension row, close the old version (set its `valid_to` /
  * clear `is_current`) and open a new one effective `asOf`. The
  * reference's ingestion layer snapshots dimensions wholesale
  * (`ingestion_task.py` date-partitioned overwrites); this is the
  * companion merge for consumers who need AS-OF history rather than
  * latest-only snapshots.
  *
  * Dataflow (one pass, scale-first):
  *   - the dimension's HISTORY slice (`is_current = false`) passes
  *     through untouched — it never enters the join (store the dimension
  *     partitioned by `is_current` and this is a metadata-only split);
  *   - the CURRENT slice full-outer-joins the update batch on the
  *     business key (planner's choice of broadcast vs shuffle — update
  *     batches are usually small ⇒ BHJ);
  *   - each joined row emits its 1–2 output rows via one array+explode
  *     projection — no re-evaluation of the join per output class, no
  *     persist, stays inside whole-stage codegen.
  *
  * Change detection is null-safe (`<=>` per attribute): a NULL→value or
  * value→NULL transition is a change, NULL→NULL is not. Keys are
  * null-safe-joined for the same reason. Deterministic: pure column
  * algebra, no clocks — `asOf` is caller-supplied.
  */
object Scd {

  /** Merge `updates` (business key + attributes, effective `asOf`) into
    * SCD2 dimension `dim`, returning the NEW full dimension:
    *
    *   - history rows (`is_current = false`): unchanged passthrough;
    *   - current row with no update, or an update equal on every
    *     attribute: unchanged;
    *   - current row with a differing update: emitted CLOSED
    *     (`valid_to = asOf`, `is_current = false`) plus a new OPEN row
    *     (`valid_from = asOf`);
    *   - update key absent from the dimension: new OPEN row.
    *
    * `dim` must carry `keyCols ++ attrCols ++ (validFromCol DATE,
    * validToCol DATE, currentCol BOOLEAN)`; `updates` carries
    * `keyCols ++ attrCols`. Open rows use `valid_to = openEnd`
    * (9999-12-31 sentinel, not NULL — range predicates like
    * `valid_from <= d AND d < valid_to` then need no null branch). */
  def scd2Merge(dim: DataFrame, updates: DataFrame, keyCols: Seq[String],
                attrCols: Seq[String], asOf: String,
                openEnd: String = "9999-12-31",
                validFromCol: String = "valid_from",
                validToCol: String = "valid_to",
                currentCol: String = "is_current"): DataFrame = {
    require(keyCols.nonEmpty, "SCD2 merge needs at least one key column")
    val outCols = keyCols ++ attrCols ++ Seq(validFromCol, validToCol, currentCol)
    val asOfD = to_date(lit(asOf))
    val openD = to_date(lit(openEnd))

    val hist = dim.filter(!col(currentCol)).select(outCols.map(col): _*)
    val cur = dim.filter(col(currentCol))
    val upd = updates.select(
      (keyCols ++ attrCols).map(c => col(c).as(s"__u_$c")) :+
        lit(true).as("__u"): _*)

    val joined = cur.join(upd,
      keyCols.map(k => col(k) <=> col(s"__u_$k")).reduce(_ && _), "full_outer")
    val curPresent = col(currentCol).isNotNull // cur-side literal-free marker
    val updPresent = col("__u").isNotNull
    val changed = attrCols.map(a => !(col(a) <=> col(s"__u_$a")))
      .foldLeft(lit(false))(_ || _)

    def rowStruct(key: String => Column, attr: String => Column, vf: Column,
                  vt: Column, c: Column): Column =
      struct(keyCols.map(k => key(k).as(k)) ++
        attrCols.map(a => attr(a).as(a)) ++
        Seq(vf.as(validFromCol), vt.as(validToCol), c.as(currentCol)): _*)

    val keepRow = rowStruct(col, col, col(validFromCol), col(validToCol),
      col(currentCol))
    val closedRow = rowStruct(col, col, col(validFromCol), asOfD, lit(false))
    val openRow = rowStruct(k => col(s"__u_$k"), a => col(s"__u_$a"), asOfD,
      openD, lit(true))

    val emit = when(curPresent && updPresent && changed,
        array(closedRow, openRow))
      .when(curPresent, array(keepRow))
      .otherwise(array(openRow))

    joined.select(explode(emit).as("__r"))
      .select(outCols.map(c => col(s"__r.$c").as(c)): _*)
      .unionByName(hist)
  }
}
