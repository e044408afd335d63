package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Range (interval) join — point-in-interval matching without the
  * theta-join pair explosion: intervals are exploded into the fixed-width
  * time bins they cover, points carry their single bin, and the join runs
  * as an EQUI-join on (keys..., bin) followed by the exact range filter.
  * Each (point, interval) candidate meets in exactly one bin (the
  * point's), so no dedup pass is needed.
  *
  * Cost is |intervals|·(span/binWidth) exploded rows instead of the
  * |points|·|intervals|-per-key nested loop Spark plans for a raw
  * inequality join — choose `binSeconds` near the typical interval span
  * so the explosion factor stays small. At 100 TB this is the standard
  * interval-join shape (bin + equi-shuffle + verify).
  *
  * Interval columns arrive prefixed (`range_` by default); the match is
  * inclusive on both ends — compose extra strictness as a post-filter.
  */
object RangeJoin {

  def binnedRangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                      pointCol: String, startCol: String, endCol: String,
                      binSeconds: Long, rightPrefix: String = "range_"): DataFrame = {
    require(binSeconds > 0, "bin width must be positive")
    val binMicros = binSeconds * 1000000L
    // unix_micros rejects TIMESTAMP_NTZ (the naive-parquet fixture read);
    // cast through TIMESTAMP first — value-preserving under the UTC
    // session timezone every graft entry point pins, and the bin id only
    // needs to be one consistent monotone map applied to both sides (the
    // exact range filter below re-checks the original values).
    def binOf(c: Column): Column =
      // decimal floor-division, NOT `/` (double division loses exactness
      // above 2^53 µs — the sibling Histogram/Quantiles convention) and
      // NOT integer `div` (truncation-toward-zero would make bin 0 twice
      // as wide across the epoch); floor is exact and monotone everywhere
      floor(unix_micros(c.cast("timestamp"))
        .cast(org.apache.spark.sql.types.DecimalType(20, 0)) / binMicros)
        .cast("long")

    val p = points.withColumn("__bin", binOf(col(pointCol)))
    val i0 = intervals.columns.filterNot(keys.contains)
      .foldLeft(intervals) { (df, c) => df.withColumnRenamed(c, s"$rightPrefix$c") }
    val i = i0
      .withColumn("__bin", explode(sequence(
        binOf(col(s"$rightPrefix$startCol")), binOf(col(s"$rightPrefix$endCol")))))

    p.join(i, keys :+ "__bin")
      .filter(col(pointCol) >= col(s"$rightPrefix$startCol") &&
        col(pointCol) <= col(s"$rightPrefix$endCol"))
      .drop("__bin")
  }

  /** Interval × interval OVERLAP join — both sides explode into the
    * fixed-width bins they cover and meet as an EQUI-join on
    * (keys..., bin), then the exact inclusive overlap predicate
    * (ls ≤ re ∧ rs ≤ le) re-checks the originals. An overlapping pair
    * shares every bin its intersection covers, which would duplicate
    * the pair once per shared bin — instead of a `distinct` pass over
    * the output (a full extra shuffle of pair rows), each pair is
    * emitted ONLY in the bin containing `greatest(ls, rs)`, the start
    * of the intersection: that bin is unique per pair and always
    * shared, so the join is exactly-once by construction.
    *
    * Cost: Σ span/binWidth exploded rows per side (pick `binSeconds`
    * near the typical interval length); the join is one equi-shuffle by
    * (keys, bin) — the standard scale shape, no theta-join nested loop,
    * no dedup shuffle.
    *
    * Contract: intervals must satisfy start ≤ end. An inverted interval
    * is garbage-in (the overlap predicate can still fire against it) —
    * gate with [[Expectations]] upstream if the source can't guarantee
    * it. */
  def overlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                  lStartCol: String, lEndCol: String,
                  rStartCol: String, rEndCol: String,
                  binSeconds: Long, rightPrefix: String = "r_"): DataFrame = {
    require(binSeconds > 0, "bin width must be positive")
    val binMicros = binSeconds * 1000000L
    def binOf(c: Column): Column =
      // decimal floor-division, NOT `/` (double division loses exactness
      // above 2^53 µs — the sibling Histogram/Quantiles convention) and
      // NOT integer `div` (truncation-toward-zero would make bin 0 twice
      // as wide across the epoch); floor is exact and monotone everywhere
      floor(unix_micros(c.cast("timestamp"))
        .cast(org.apache.spark.sql.types.DecimalType(20, 0)) / binMicros)
        .cast("long")

    val l = left
      .withColumn("__bin",
        explode(sequence(binOf(col(lStartCol)), binOf(col(lEndCol)))))
    val r0 = right.columns.filterNot(keys.contains)
      .foldLeft(right) { (df, c) => df.withColumnRenamed(c, s"$rightPrefix$c") }
    val rs = col(s"$rightPrefix$rStartCol")
    val re = col(s"$rightPrefix$rEndCol")
    val r = r0.withColumn("__bin", explode(sequence(binOf(rs), binOf(re))))

    l.join(r, keys :+ "__bin")
      .filter(col(lStartCol) <= re && rs <= col(lEndCol))
      // exactly-once: keep the pair only in the intersection's first bin
      .filter(col("__bin") === binOf(greatest(col(lStartCol), rs)))
      .drop("__bin")
  }
}
