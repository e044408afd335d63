package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed MERGE (upsert) between a target table and a staging batch —
  * `MERGE INTO target USING updates ON keys WHEN MATCHED THEN UPDATE
  * WHEN NOT MATCHED THEN INSERT`, as one full-outer join:
  *
  *   - key in both       → the staging row wins (update)
  *   - key only in batch → staging row (insert)
  *   - key only in target→ target row (carried through unchanged)
  *
  * plus the delete-form companion [[upsertDelete]] that drops target
  * keys named in a tombstone set.
  *
  * Scale shape: ONE full-outer shuffle join on the key, no window, no
  * driver state; the batch side is typically day-sized so AQE plans it
  * as the small side. Schemas must match by name (enforce upstream with
  * unionByName semantics). Precedence is per whole row — MERGE
  * semantics, not column-level coalescing (that's
  * [[Reconcile]]-territory); rows are never duplicated because the key
  * is unique per side (assert upstream with [[Quality.duplicates]]).
  *
  * For history-preserving dimension merges use [[Scd.scd2Merge]]; this
  * is the overwrite-in-place fact/state variant.
  */
object Merge {

  /** Upsert `updates` into `target` on `keys`: matched keys take the
    * staging row wholesale, unmatched staging keys insert, untouched
    * target keys carry through. Column order follows `target`. */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    require(target.columns.sorted.sameElements(updates.columns.sorted),
      s"schema mismatch: target ${target.columns.mkString(",")} vs " +
        s"updates ${updates.columns.mkString(",")}")
    // names alone are not a schema: a type-mismatched updates frame
    // would otherwise slip past and the when/otherwise payload pick
    // silently widens to a common type (or fails late in analysis)
    // instead of erroring here, at the operator boundary
    val tTypes = target.schema.map(f => f.name -> f.dataType).toMap
    val typeDiffs = updates.schema
      .filter(f => tTypes(f.name) != f.dataType)
      .map(f => s"${f.name}: target ${tTypes(f.name).simpleString} vs " +
        s"updates ${f.dataType.simpleString}")
    require(typeDiffs.isEmpty, s"column type mismatch: ${typeDiffs.mkString("; ")}")
    val payload = target.columns.filterNot(keys.contains).toSeq
    val t = payload.foldLeft(target) { (df, c) => df.withColumnRenamed(c, s"__t_$c") }
    // a NULL payload can't distinguish sides; the updates-side key
    // presence can: mark it before the join
    val u = payload.foldLeft(updates) { (df, c) => df.withColumnRenamed(c, s"__u_$c") }
      .withColumn("__from_u", lit(true))
    val j = t.join(u, keys, "full_outer")
    j.select(
      keys.map(col) ++ payload.map { c =>
        when(col("__from_u"), col(s"__u_$c")).otherwise(col(s"__t_$c")).as(c)
      }: _*)
  }

  /** [[upsert]] then delete: tombstoned keys are removed from the
    * result (whether they came from target or updates). `tombstones`
    * carries just the key columns. */
  def upsertDelete(target: DataFrame, updates: DataFrame, keys: Seq[String],
                   tombstones: DataFrame): DataFrame =
    upsert(target, updates, keys).join(tombstones, keys, "left_anti")
}
