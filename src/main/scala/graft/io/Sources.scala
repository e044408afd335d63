package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source connectors — re-expression of the reference's extract surface
  * (SURVEY.md §2.1 S1-S6, S9).
  *
  * Scale posture: every reader returns a lazy DataFrame; none of them
  * trigger the reference's eager `df.count()`-per-read anti-pattern
  * (reference `dags/utils.py:128`, SURVEY.md §4.1). Schemas are declared,
  * not inferred, on the hot paths (inference reads the data twice).
  */
object Sources {

  /** S1 — JSON-records source. The reference fetches REST JSON on the
    * driver and parallelizes `Row(**r)` dicts (reference
    * `dags/utils.py:56-69`, `ingestion_task.py:22-29`). The transport
    * (HTTP fetch) is connector plumbing outside Spark; this entry point
    * takes the fetched payload (one JSON object per element) and lets the
    * JSON datasource do typed parsing on executors. */
  def fromJsonRecords(spark: SparkSession, records: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.json(spark.createDataset(records))
  }

  /** S1 variant with a declared schema (skips inference). */
  def fromJsonRecords(spark: SparkSession, records: Seq[String], schema: StructType): DataFrame = {
    import spark.implicits._
    spark.read.schema(schema).json(spark.createDataset(records))
  }

  /** S3 — CSV source with header; schema declared when known (the
    * reference infers — `ingestion_task.py:238-242` — which double-reads). */
  def csv(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema.fold(r.option("inferSchema", "true"))(s => r.schema(s)).csv(path)
  }

  /** JSONL (newline-delimited JSON) corpus source. Schema declared when
    * known — inference double-reads, and a 100 TB corpus scan must not
    * pay that twice. Compressed inputs (`.jsonl.gz`) are handled by the
    * codec automatically. */
  def jsonl(spark: SparkSession, path: String,
            schema: Option[StructType] = None): DataFrame =
    schema.fold(spark.read)(s => spark.read.schema(s)).json(path)

  /** ORC source — Spark-native columnar read with the same pushdown/
    * pruning behavior as parquet (predicate + column pushdown verified
    * in `IoSpec`). Schema declared when known, like [[jsonl]]. */
  def orc(spark: SparkSession, path: String,
          schema: Option[StructType] = None): DataFrame =
    schema.fold(spark.read)(s => spark.read.schema(s)).orc(path)

  /** Plain-text corpus source. Line mode (default) yields one row per
    * line (`value`) — the layout of one-doc-per-line dumps; `wholeFile`
    * yields one row per FILE, for corpora shipped as a file per document
    * (pair with `input_file_name()` for the doc id). Line mode splits
    * large files across tasks; whole-file mode necessarily reads a file
    * per row — cap file sizes upstream. */
  def text(spark: SparkSession, path: String, wholeFile: Boolean = false): DataFrame =
    if (wholeFile) spark.read.option("wholetext", "true").text(path)
    else spark.read.text(path)

  /** Raw media files as (path, modificationTime, length, content) rows —
    * the ingestion edge of the multimodal pipeline: point it at an
    * image/audio dump and feed `content` to
    * [[graft.ops.Multimodal.decodeFeatures]]. Built on Spark's
    * `binaryFile` format: partition dirs prune, `pathGlobFilter`
    * (e.g. `*.png`) selects codecs at listing time (no post-filter scan),
    * and the session conf `spark.sql.sources.binaryFile.maxLength` caps
    * per-file bytes so one oversized blob can't OOM an executor task. */
  def binaryFiles(spark: SparkSession, path: String,
                  glob: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    glob.fold(r)(g => r.option("pathGlobFilter", g)).load(path)
  }

  /** S4 — whole-table JDBC source (reference `dags/utils.py:115-129`).
    *
    * DIALECT DELTA (documented because this sandbox can only prove JDBC
    * against embedded Derby — no egress, no Postgres jar — while the
    * reference's surface is Postgres): Spark routes per-database type
    * mapping through its `JdbcDialect` registry keyed by the URL, so the
    * CODE here is identical for both; what changes underneath, and what a
    * Postgres deployment should expect vs the Derby-proven behavior:
    *   - writes: `StringType` maps to TEXT on Postgres vs CLOB on Derby;
    *     `BooleanType` to BOOLEAN vs SMALLINT-like emulation; unlimited
    *     `DecimalType` defaults differ (Postgres NUMERIC is unconstrained,
    *     Derby caps precision at 31 — a decimal(38,x) frame that writes
    *     on Postgres fails on Derby, which is why the JdbcSpec fixtures
    *     stay within (31, x)).
    *   - reads: Postgres TEXT/VARCHAR both surface as `StringType` (no
    *     width), TIMESTAMPTZ surfaces as `TimestampType` shifted to
    *     session UTC, and `bytea` as `BinaryType`; Derby has no TZ-aware
    *     timestamp so that path is untested here.
    *   - identifiers: both dialects double-quote, but Postgres folds
    *     UNQUOTED identifiers to lower-case while Derby folds UPPER —
    *     mixed-case `dbtable` strings that work on one may need quoting
    *     on the other (this library passes table strings through
    *     verbatim).
    * The partitioned/subquery readers below inherit the same dialect
    * handling unchanged. */
  def jdbcTable(spark: SparkSession, url: String, table: String,
                props: Map[String, String]): DataFrame = {
    val r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    props.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  /** S4 at scale — range-partitioned JDBC table read. The reference reads
    * whole tables through ONE connection (`dags/utils.py:123-127`), which
    * is the single-stream extract bottleneck at 100 TB: a typed
    * `partitionColumn/lowerBound/upperBound/numPartitions` spec opens
    * `numPartitions` parallel connections, each scanning a disjoint
    * stride of the key range (`WHERE col >= lo+k·step AND col < ...`),
    * pushed down to the database. Rows with a NULL partition column land
    * in the first stride (Spark's contract). `lo`/`hi` only steer the
    * stride layout — rows outside the range are still read by the
    * unbounded edge strides, so the result set equals the whole table.
    * Size `n` to what the database can serve concurrently, not to the
    * cluster's core count. */
  def jdbcTablePartitioned(spark: SparkSession, url: String, table: String,
                           partitionCol: String, lo: Long, hi: Long, n: Int,
                           props: Map[String, String]): DataFrame = {
    require(n > 0, s"numPartitions must be positive, got $n")
    require(lo <= hi, s"lowerBound $lo must be <= upperBound $hi")
    val r = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("partitionColumn", partitionCol)
      .option("lowerBound", lo).option("upperBound", hi)
      .option("numPartitions", n)
    props.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  /** S5 — JDBC subquery pushdown: wraps arbitrary SQL as a dbtable
    * subquery so predicates/projections run in the RDBMS (reference
    * `Raptor.py:20-38`). */
  def jdbcQuery(spark: SparkSession, url: String, sql: String,
                props: Map[String, String]): DataFrame =
    jdbcTable(spark, url, s"($sql) as subquery", props)

  /** S6 — parquet source registered as a temp view + SQL over it
    * (reference `Raptor.py:89-100`, including the `reporting.<table>`
    * prefix rewrite — done with a word-boundary regex, not plain
    * `String.replace`, so the prefix inside a LONGER identifier
    * (`xreporting.foo`, `reporting.foobar`) is left alone. A
    * `reporting.<view>` token inside a string LITERAL is still
    * rewritten (`\b` cannot see quoting) — same limitation as the
    * reference's replace; pass SQL without such literals. */
  def parquetSql(spark: SparkSession, path: String, view: String, sql: String): DataFrame = {
    spark.read.parquet(path).createOrReplaceTempView(view)
    val pat = ("(?i)\\breporting\\." + java.util.regex.Pattern.quote(view) + "\\b").r
    spark.sql(pat.replaceAllIn(sql, java.util.regex.Matcher.quoteReplacement(view)))
  }

  /** S9 — dated-path resolution, the reference's
    * `{bucket}/{YYYYMMDD}/{entity}_{YYYYMMDD}.csv` convention
    * (reference `ingestion_task.py:234-238`). */
  def datedPath(bucket: String, entity: String, date: java.time.LocalDate,
                ext: String = "csv"): String = {
    val d = date.format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
    s"$bucket/$d/${entity}_$d.$ext"
  }

  /** The object-store seam. The reference reads/writes cloud buckets
    * directly (`Rest-API/main.py:42-56`, `Raptor.py:104-109`:
    * `gs://<bucket>/{yyyymmdd}/...`); in Spark that whole concern lives
    * in the Hadoop FileSystem layer — every reader/sink in this file
    * takes a URI string whose SCHEME picks the filesystem (`file://`,
    * `hdfs://`, `gs://`, `s3a://`, ...), so moving to a cloud bucket is
    * deployment configuration, not code: put the connector jar on the
    * classpath and inject its credentials/tuning via this pass-through
    * (keys like `fs.gs.auth.*` / `fs.s3a.access.key`). Set BEFORE the
    * first read of that scheme — Hadoop caches FileSystem instances per
    * (scheme, authority). IoSpec proves the seam with `file://` standing
    * in for `gs://` (this sandbox has zero egress and no cloud
    * connector jars). */
  def configureFs(spark: SparkSession, conf: Map[String, String]): Unit =
    conf.foreach { case (k, v) =>
      spark.sparkContext.hadoopConfiguration.set(k, v)
    }

  /** Worked [[configureFs]] map for `s3a://` buckets — the public Hadoop
    * S3A connector settings (hadoop-aws + aws-sdk on the classpath at
    * deploy time; none of this resolves in the zero-egress sandbox, and
    * IoSpec only asserts key/URI plumbing). Static keys omitted: modern
    * Hadoop maps the `s3a` scheme to `S3AFileSystem` by itself.
    *
    * Prefer leaving `accessKey`/`secretKey` at None in real deployments —
    * the connector's default credential chain (env vars, instance
    * profile, STS) then applies; explicit keys are for private endpoints
    * (the MinIO/on-prem case, where `endpoint` + `pathStyleAccess` are
    * usually needed too). */
  def s3aConf(accessKey: Option[String] = None,
              secretKey: Option[String] = None,
              endpoint: Option[String] = None,
              pathStyleAccess: Boolean = false,
              extra: Map[String, String] = Map.empty): Map[String, String] =
    accessKey.map("fs.s3a.access.key" -> _).toMap ++
      secretKey.map("fs.s3a.secret.key" -> _).toMap ++
      endpoint.map("fs.s3a.endpoint" -> _).toMap ++
      (if (pathStyleAccess) Map("fs.s3a.path.style.access" -> "true")
       else Map.empty) ++ extra

  /** Worked [[configureFs]] map for `gs://` buckets — the public GCS
    * connector settings (gcs-connector shaded jar on the classpath at
    * deploy time). Unlike s3a, the `gs` scheme has no built-in mapping,
    * so the impl keys must be set explicitly. `jsonKeyfile` = None uses
    * application-default credentials (the GCE/GKE metadata server —
    * what the reference's Airflow deployment relies on for its
    * `gs://meta-morph-flow` reads, `Rest-API/main.py:42-56`). */
  def gcsConf(jsonKeyfile: Option[String] = None,
              projectId: Option[String] = None,
              extra: Map[String, String] = Map.empty): Map[String, String] =
    Map(
      "fs.gs.impl" -> "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem",
      "fs.AbstractFileSystem.gs.impl" ->
        "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFS") ++
      projectId.map("fs.gs.project.id" -> _).toMap ++
      (jsonKeyfile match {
        case Some(path) => Map(
          "google.cloud.auth.service.account.enable" -> "true",
          "google.cloud.auth.service.account.json.keyfile" -> path)
        case None => Map("google.cloud.auth.service.account.enable" -> "true")
      }) ++ extra
}
