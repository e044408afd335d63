package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bivariate statistics with an EXACT integer core — correlation and
  * OLS slope/intercept that reproduce bit-for-bit across engines,
  * partitionings, and retries. The textbook `corr()` aggregates float
  * co-moments whose accumulation order is partition-dependent: on a
  * 1000-executor cluster the same data can yield a different 15th
  * decimal every run — poison for differential testing and cached
  * derived tables. Here the inputs are fixed-point-scaled to integers
  * (`round(v·scale)`), the five moment sums (Σx, Σy, Σx², Σy², Σxy)
  * accumulate in DECIMAL(38,0) — exact integer arithmetic, associative
  * and order-independent — and the classic closed forms apply a FIXED
  * sequence of IEEE double ops at the very end:
  *
  *   corr  = (n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²ₜ) · √(n·Σy² − Σy²ₜ))
  *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²ₜ)   [y per x, scales cancel]
  *
  * sqrt is correctly rounded per IEEE 754, so the whole tail is
  * deterministic. Precision: the scaled values' squares times n must fit
  * 38 digits — ~10¹⁹ rows of 10⁹-scaled values before overflow, far past
  * any real table.
  *
  * Shape at 100 TB: ONE map-side-combined aggregation per group (the
  * moments are classic mergeable state); the derived statistics are
  * per-group scalar expressions on the aggregated frame. No second pass,
  * no window, no driver math.
  */
object Stats {

  private val Dec = DecimalType(38, 0)

  /** Per-group exact moments + derived corr/slope/intercept.
    * `scale` is the fixed-point multiplier (100 for 2-decimal money);
    * rows where either column is NULL, NaN, or ±Infinity are excluded
    * (pairwise-complete over FINITE values — a NaN row must leave both
    * `n` and the sums together, or the closed forms silently use an
    * inconsistent n and corr can leave [−1, 1]).
    * Degenerate groups (zero variance in x or y) return NULL corr, and
    * zero x-variance also NULLs slope/intercept — mirroring SQL `corr`.
    * Returns (groupCols..., n, corr, slope, intercept). */
  def groupedCorrSlope(df: DataFrame, groupCols: Seq[String],
                       xCol: String, yCol: String,
                       scale: Long = 100L): DataFrame = {
    require(scale >= 1, "scale must be >= 1")
    val x = round(col(xCol) * scale).cast(Dec)
    val y = round(col(yCol) * scale).cast(Dec)
    def finite(c: String) = {
      val d = col(c).cast("double")
      col(c).isNotNull && !isnan(d) && abs(d) <= Double.MaxValue
    }
    val filtered = df.filter(finite(xCol) && finite(yCol))
    val m = filtered
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast(Dec).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"),
        sum(x * y).as("sxy"))
    // exact integer numerators/denominators, cast to double ONCE each
    val covN = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val varXN = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val varYN = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    // slope/intercept are in ORIGINAL units: the common fixed-point
    // scale cancels in slope; intercept rescales the means by 1/scale
    val slope = when(varXN > 0.0, covN / varXN)
    val meanX = (col("sx").cast("double") / col("n").cast("double")) / scale
    val meanY = (col("sy").cast("double") / col("n").cast("double")) / scale
    m.select(groupCols.map(col) ++ Seq(
      col("n").cast("long").as("n"),
      when(varXN > 0.0 && varYN > 0.0,
        covN / (sqrt(varXN) * sqrt(varYN))).as("corr"),
      slope.as("slope"),
      (meanY - slope * meanX).as("intercept")): _*)
  }
}
