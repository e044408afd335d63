package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Equi-width histograms — the profiling companion to [[Profile]] and
  * [[Quantiles]]: one map-side-combined aggregation keyed by bin id, so
  * the shuffle carries at most `bins` rows per partition regardless of
  * input size. Bin edges are taken from the caller (or one (min, max)
  * scan via [[histogramAuto]]) and computed with integer arithmetic on
  * integral columns, so bin assignment is exact and engine-portable —
  * no float-boundary flicker between Spark and the differential oracle.
  */
object Histogram {

  /** Histogram of an integral column over [lo, hi] with `bins` equal
    * integer-width bins (the last bin absorbs the remainder up to and
    * including `hi`; values outside [lo, hi] are dropped). Returns
    * (bin, bin_lo, bin_hi inclusive, n) sorted by bin; empty bins are
    * present with n = 0 — a fixed-cardinality sequence literal, not a
    * scan artifact. */
  def histogram(df: DataFrame, valueCol: String, lo: Long, hi: Long,
                bins: Int): DataFrame = {
    require(bins > 0, "bins must be positive")
    require(hi >= lo, s"empty range [$lo, $hi]")
    // a range wider than 2^63 − 1 overflows (hi − lo) and (v − lo): the
    // silent failure mode is garbage widths and negative bin ids whose
    // rows vanish in the scaffold join. Refuse loudly instead — a
    // full-64-bit-domain column (hashes) needs the sign-splitting
    // selection protocol (Quantiles), not an equi-width histogram.
    require(BigInt(hi) - BigInt(lo) <= Long.MaxValue,
      s"range [$lo, $hi] spans more than 2^63 - 1; " +
        "(v - lo) would overflow — narrow the range or split at zero")
    // ceil width so bins*width covers the range; exact long arithmetic
    val width = math.max(1L, (hi - lo) / bins + (if ((hi - lo) % bins == 0) 0L else 1L))
    val v = col(valueCol).cast("long")
    // `div`, not `/`: Spark's `/` on longs is DOUBLE division, whose
    // floor misassigns bins once |v - lo| exceeds 2^53. div is exact
    // long arithmetic at any magnitude (v >= lo holds post-filter, so
    // truncation == floor).
    val binRaw = expr(s"(CAST(`$valueCol` AS BIGINT) - ${lo}L) div ${width}L")
    val counted = df.filter(v >= lo && v <= hi)
      .withColumn("bin", least(binRaw, lit(bins - 1L)).cast("long"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    val spark = df.sparkSession
    val allBins = spark.range(bins).select(col("id").as("bin"))
    allBins.join(counted, Seq("bin"), "left")
      .select(col("bin"),
        (lit(lo) + col("bin") * width).as("bin_lo"),
        least(lit(hi), lit(lo) + (col("bin") + 1) * width - 1).as("bin_hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** [[histogram]] with edges from one (min, max) scan of the column. */
  def histogramAuto(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    val r = df.agg(min(col(valueCol).cast("long")),
      max(col(valueCol).cast("long"))).first()
    require(!r.isNullAt(0), s"$valueCol has no non-null values")
    histogram(df, valueCol, r.getLong(0), r.getLong(1), bins)
  }

  /** Equi-DEPTH histogram: `buckets` bins holding (up to ties) equal row
    * counts, the data-skipping / partition-sizing companion to the
    * equi-width form above. Bucket edges are the exact type-1 quantiles
    * at q = i/buckets (the [[Quantiles]] distributed-selection protocol
    * — no global sort, no single-partition window, driver state is the
    * `buckets − 1` boundary VALUES only), and bucket membership is
    * value-based: bucket(v) = #{boundaries < v}, an integer sum of
    * comparisons against broadcast literals — one codegen'd scan, one
    * bounded groupBy. Ties that straddle a nominal boundary land in one
    * bucket together (counts then deviate from n/buckets — the honest
    * answer; splitting ties needs a global row numbering, which is the
    * scale-killer this form exists to avoid).
    *
    * Returns one row per bucket 0..buckets−1: (bucket, n, lo, hi) with
    * n = 0 and NULL lo/hi for buckets emptied by boundary ties. */
  def equiDepth(df: DataFrame, valueCol: String, buckets: Int): DataFrame = {
    require(buckets > 1, "need at least 2 buckets")
    val qs = (1 until buckets).map(i => i.toDouble / buckets)
    val boundaries = Quantiles.exactQuantiles(df, valueCol, qs).map(_._2)
    val v = col(valueCol).cast("long")
    val bucket = boundaries.foldLeft(lit(0L)) { (acc, b) =>
      acc + when(v > b, 1L).otherwise(0L)
    }
    val counted = df.filter(v.isNotNull)
      .withColumn("bucket", bucket)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min(v).as("lo"), max(v).as("hi"))
    val spark = df.sparkSession
    spark.range(buckets).select(col("id").as("bucket"))
      .join(counted, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("n"), lit(0L)).as("n"),
        col("lo"), col("hi"))
  }

  /** DuckDB-equivalent SQL for [[equiDepth]]'s differential oracle: the
    * same ⌈q·n⌉ rank selection via row_number, the same comparison-sum
    * bucket assignment. */
  def equiDepthOracleSql(table: String, valueCol: String, buckets: Int): String = {
    val bs = (1 until buckets).map { i =>
      val q = i.toDouble / buckets
      s"""(SELECT v FROM s, t
         |   WHERE rn = GREATEST(1, CAST(ceil($q * t.cnt) AS BIGINT))) AS b$i"""
        .stripMargin
    }.mkString(",\n")
    val sumExpr = (1 until buckets)
      .map(i => s"CAST(s.v > b.b$i AS BIGINT)").mkString(" + ")
    s"""WITH s AS (SELECT CAST($valueCol AS BIGINT) AS v,
       |             ROW_NUMBER() OVER (ORDER BY CAST($valueCol AS BIGINT)) AS rn
       |           FROM $table WHERE $valueCol IS NOT NULL),
       |t AS (SELECT COUNT(*) AS cnt FROM $table WHERE $valueCol IS NOT NULL),
       |b AS (SELECT $bs),
       |x AS (SELECT s.v, $sumExpr AS bucket FROM s, b),
       |c AS (SELECT bucket, COUNT(*) AS n, MIN(v) AS lo, MAX(v) AS hi
       |      FROM x GROUP BY 1),
       |k AS (SELECT UNNEST(range(0, $buckets)) AS bucket)
       |SELECT k.bucket, COALESCE(c.n, 0) AS n, c.lo, c.hi
       |FROM k LEFT JOIN c ON k.bucket = c.bucket ORDER BY k.bucket""".stripMargin
  }

  /** DuckDB-equivalent SQL for the differential oracle (same exact
    * integer bin arithmetic, empty bins materialized from a sequence). */
  def oracleSql(table: String, valueCol: String, lo: Long, hi: Long,
                bins: Int): String = {
    val width = math.max(1L, (hi - lo) / bins + (if ((hi - lo) % bins == 0) 0L else 1L))
    s"""WITH b AS (SELECT UNNEST(range(0, $bins)) AS bin),
       |c AS (SELECT LEAST((CAST($valueCol AS BIGINT) - $lo) // $width,
       |             ${bins - 1}) AS bin, COUNT(*) AS n
       |      FROM $table
       |      WHERE CAST($valueCol AS BIGINT) BETWEEN $lo AND $hi GROUP BY 1)
       |SELECT b.bin, $lo + b.bin * $width AS bin_lo,
       |       LEAST($hi, $lo + (b.bin + 1) * $width - 1) AS bin_hi,
       |       COALESCE(c.n, 0) AS n
       |FROM b LEFT JOIN c ON b.bin = c.bin ORDER BY b.bin""".stripMargin
  }
}
