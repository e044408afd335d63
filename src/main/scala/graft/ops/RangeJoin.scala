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
      (unix_micros(c.cast("timestamp")) / binMicros).cast("long")

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
}
