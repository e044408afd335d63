package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group feature scaling for training-data pipelines — normalize a
  * numeric signal WITHIN each stratum (language, source, shard) so
  * downstream filters/curricula compare like with like.
  *
  * Both forms are built from exact per-group statistics, so the scaled
  * value is a deterministic pure function of the input set — Spark and
  * DuckDB produce bit-identical doubles (one IEEE division of exactly
  * representable operands; no float accumulation anywhere):
  *
  *   - [[robustScale]]: (v − median) / (p75 − p25), the outlier-immune
  *     standardization. Mean/stddev z-scores are deliberately NOT
  *     offered on doubles: a distributed float sum is
  *     accumulation-order-dependent, so the result would differ run to
  *     run at 1000 executors — median/IQR over integral values is both
  *     more robust and exactly reproducible. All three quantiles come
  *     from ONE [[Quantiles.groupedExactQuantiles]] protocol
  *     (bin-refinement, ≤7 aggregation rounds over ALL groups and ranks
  *     at once, no per-group window sort — the 100 TB-safe shape).
  *   - [[minMaxScale]]: (v − min) / (max − min), one map-side-combined
  *     aggregate for the per-group extrema.
  *
  * Group statistics frames are key-cardinality sized and broadcast to
  * the fact side — no shuffle of the scaled table.
  */
object Scaling {

  /** Adds `robust_z` = (value − p50) / (p75 − p25), per group; NULL when
    * the IQR is zero (degenerate group). Value column must be integral
    * (the exact-quantile contract). */
  def robustScale(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    // ONE shared refinement protocol for all three ranks
    // ([[Quantiles.groupedExactQuantiles]]) — three independent calls
    // would triple the multi-round aggregation cost over the full input
    val stats = Quantiles.groupedExactQuantiles(df, groupCol, valueCol,
      Seq("p25" -> 0.25, "p50" -> 0.50, "p75" -> 0.75))
    val iqr = col("p75") - col("p25")
    df.join(broadcast(stats), groupCol)
      .withColumn("robust_z",
        when(iqr === 0, lit(null).cast("double"))
          .otherwise((col(valueCol) - col("p50")).cast("double") / iqr.cast("double")))
      .drop("p25", "p50", "p75")
  }

  /** Winsorize: clip `valueCol` into its per-group [pLo, pHi] exact
    * quantile band — the standard outlier-taming step before
    * sum/mean-driven downstream stats (token budgets, length-weighted
    * sampling) where one pathological document would otherwise dominate.
    * Adds `clipped` (the clamped value, same type as the input) and
    * `was_clipped` (1 when the row moved). Pure order statistics and
    * comparisons — no arithmetic at all — so the output is
    * bit-deterministic for any input type the exact-quantile contract
    * admits (integral values). Same scale posture as [[robustScale]]:
    * one shared multi-rank refinement protocol, broadcast stats,
    * no shuffle of the fact side. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo < pHi, s"pLo ($pLo) must be below pHi ($pHi)")
    val stats = Quantiles.groupedExactQuantiles(df, groupCol, valueCol,
      Seq("__lo" -> pLo, "__hi" -> pHi))
    df.join(broadcast(stats), groupCol)
      .withColumn("clipped",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .withColumn("was_clipped",
        when(col("clipped") === col(valueCol), 0).otherwise(1))
      .drop("__lo", "__hi")
  }

  /** Adds `minmax` = (v − min) / (max − min) in [0, 1], per group; NULL
    * when the group is constant. Works for any numeric column — the
    * extrema are exact order statistics, not accumulations. */
  def minMaxScale(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val stats = df.groupBy(groupCol)
      .agg(min(col(valueCol)).as("__lo"), max(col(valueCol)).as("__hi"))
    df.join(broadcast(stats), groupCol)
      .withColumn("minmax",
        when(col("__hi") === col("__lo"), lit(null).cast("double"))
          .otherwise((col(valueCol) - col("__lo")).cast("double") /
            (col("__hi") - col("__lo")).cast("double")))
      .drop("__lo", "__hi")
  }
}
