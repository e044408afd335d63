package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink connectors — reference §2.1 S7, S8, S10.
  *
  * Scale posture: parquet writes inherit the frame's partitioning — callers
  * control file count via the upstream plan (repartition by the write key),
  * never via driver-side collects. `snapshot` applies the reference's
  * raw-overwrite + legacy-append convention in one call.
  */
object Sinks {

  /** S8 — parquet sink, overwrite mode, optional dated path layout
    * (reference `Raptor.py:104-109` writes `{bucket}/{yyyymmdd}/{name}`). */
  def parquet(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path)

  /** S7 — JDBC sink with save mode (reference `dags/utils.py:90-105`). */
  def jdbc(df: DataFrame, url: String, table: String, mode: SaveMode,
           props: Map[String, String]): Unit = {
    val w = df.write.format("jdbc").option("url", url).option("dbtable", table)
    props.foldLeft(w) { case (b, (k, v)) => b.option(k, v) }.mode(mode).save()
  }

  /** S10 — DDL side-channel executed before a JDBC load (the reference
    * creates the `work` schema via psycopg2, `Raptor.py:41-57`). Runs an
    * arbitrary pre-statement on a plain java.sql connection. */
  def jdbcWithPreDdl(df: DataFrame, url: String, table: String, mode: SaveMode,
                     props: Map[String, String], preDdl: String): Unit = {
    val info = new java.util.Properties()
    props.foreach { case (k, v) => info.setProperty(k, v) }
    val conn = java.sql.DriverManager.getConnection(url, info)
    try { val st = conn.createStatement(); try st.execute(preDdl) finally st.close() }
    finally conn.close()
    jdbc(df, url, table, mode, props)
  }

  /** Bucketed parquet table: rows pre-hashed into `buckets` files per
    * partition by the bucket columns and sorted within. Two tables
    * bucketed the same way join WITHOUT a shuffle exchange (verified in
    * `BucketingSpec`) — the 100 TB answer to the fact⋈fact join, e.g.
    * lineitem⋈orders on the order key (`graft.model.Entities.sales`).
    * Requires the table catalog (`saveAsTable`); plain `save` cannot
    * carry bucket metadata. */
  def bucketed(df: DataFrame, table: String, buckets: Int,
               bucketCols: Seq[String],
               mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Hive-style partitioned parquet layout (`path/col=value/...`) — the
    * 100 TB landing pattern: downstream scans with a partition-column
    * predicate prune whole directories before reading a byte. */
  def partitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String],
                         mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** JSONL (newline-delimited JSON) sink — the interchange format corpus
    * releases ship in. One JSON object per line; compression via the
    * standard `compression` option (e.g. "gzip") when the consumer
    * expects `.jsonl.gz`. */
  def jsonl(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite,
            compression: Option[String] = None): Unit = {
    val w = df.write.mode(mode)
    compression.fold(w)(c => w.option("compression", c)).json(path)
  }

  /** CSV sink — the interchange edge for spreadsheet/warehouse-import
    * consumers. Header on by default; compression and quoting via the
    * standard writer options. Completes the format matrix with
    * [[graft.io.Sources.csv]] on the read side. */
  def csv(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite,
          options: Map[String, String] = Map.empty): Unit = {
    val w = df.write.mode(mode).option("header", "true")
    options.foldLeft(w) { case (b, (k, v)) => b.option(k, v) }.csv(path)
  }

  /** ORC sink — Spark's other native columnar format; same lazy,
    * partitioning-inheriting posture as [[parquet]]. Useful when the
    * downstream warehouse is ORC-native (Hive/Trino deployments). */
  def orc(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  /** The reference's snapshot-ledger convention (`ingestion_task.py:66-69`
    * and parallels): the current frame overwrites `raw`, and the same frame
    * appends to the `legacy` history — a hand-rolled SCD-0 daily ledger. */
  def snapshot(df: DataFrame, rawPath: String, legacyPath: String): Unit = {
    parquet(df, rawPath, SaveMode.Overwrite)
    parquet(df, legacyPath, SaveMode.Append)
  }
}
