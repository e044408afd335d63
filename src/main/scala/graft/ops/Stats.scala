package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  private def zeroDec: Column = lit(0L).cast(Dec)

  /** TWO-LANE fixed-point representation: the exact DECIMAL(38,0) lane
    * (the r12 domain — anything the decimal arithmetic could express)
    * and a LONG fast lane that is NULL when |round(v·scale)| exceeds
    * 4e18 (the double compare is exact at this magnitude; 4e18 < 2⁶³
    * leaves a 2.3× margin over the estimate's ulp error). Sums route
    * each row to exactly one lane, so the fast path never wraps and the
    * domain never shrinks below the decimal form's. */
  private def fixedLanes(cn: String, scale: Long): (Column, Column) = {
    val scaled = round(col(cn) * scale)
    (scaled.cast(Dec),
      when(abs(scaled) <= lit(4.0e18), scaled.cast("long")))
  }

  /** Exact Σ value over `cond` rows: Sum128 for rows whose long lane is
    * defined, a decimal sum for the (rare) rest — added post-agg. */
  private def valueSum(cond: Column, aL: Column, aD: Column): Column = {
    import graft.functions.Sum128.sum128
    sum128(when(cond && aL.isNotNull, aL).otherwise(lit(0L))) +
      coalesce(sum(when(cond && aL.isNull, aD)), zeroDec)
  }

  /** Exact Σ a·b over `cond` rows: the long lane takes products whose
    * double-magnitude estimate clears 4e18 (ulp error ≪ the 2.3×
    * headroom), everything else rides the exact decimal product. */
  private def momentSum(cond: Column, aL: Column, bL: Column,
                        aD: Column, bD: Column): Column = {
    import graft.functions.Sum128.sum128
    val safe = aL.isNotNull && bL.isNotNull &&
      abs(aL.cast("double") * bL.cast("double")) < lit(4.0e18)
    sum128(when(cond && safe, aL * bL).otherwise(lit(0L))) +
      coalesce(sum(when(cond && !safe, aD * bD)), zeroDec)
  }

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
    // Fixed-point values and their per-row moment products ride LONGS
    // into the exact 128-bit sum aggregate ([[graft.functions.Sum128]]:
    // primitive two-long buffers, codegen'd carry) — Spark's decimal sum
    // with a 38-digit buffer pays a BigDecimal deserialize/add/serialize
    // per row (measured 3x this form on the sf0.1 moments scan). Rows
    // past the long fast path's range route to an exact DECIMAL lane
    // (momentSum/valueSum), so the supported domain is identical to the
    // all-decimal r12 form.
    val (xD, xL) = fixedLanes(xCol, scale)
    val (yD, yL) = fixedLanes(yCol, scale)
    def finite(c: String) = {
      val d = col(c).cast("double")
      col(c).isNotNull && !isnan(d) && abs(d) <= Double.MaxValue
    }
    val t = lit(true)
    val filtered = df.filter(finite(xCol) && finite(yCol))
    val m = filtered
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast(Dec).as("n"),
        valueSum(t, xL, xD).as("sx"), valueSum(t, yL, yD).as("sy"),
        momentSum(t, xL, xL, xD, xD).as("sxx"),
        momentSum(t, yL, yL, yD, yD).as("syy"),
        momentSum(t, xL, yL, xD, yD).as("sxy"))
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

  /** Per-group Welch two-sample comparison — the experiment-analysis
    * report (A/B value difference with the unequal-variance t
    * statistic), on the same exact-moments contract as
    * [[groupedCorrSlope]]: ONE conditional map-side-combined
    * aggregation holds both variants' (n, Σv, Σv²) in DECIMAL(38,0)
    * over fixed-point-scaled integers, and the derived statistics are a
    * FIXED tree of IEEE double ops (divisions + one correctly-rounded
    * sqrt) — bit-equal across engines and partitionings.
    *
    * Variant A = rows where `variantCol = 0`, B = everything else.
    * Sample variance uses the exact integer numerator n·Σv² − (Σv)²
    * over n·(n−1); means/variances are reported in ORIGINAL units
    * (rescaled by 1/scale and 1/scale² — t is scale-invariant but is
    * computed from the unscaled terms so the reported pieces compose).
    * Groups where either side has n < 2 or zero variance report NULL t.
    * Non-finite values are excluded (the [[groupedCorrSlope]] guard).
    *
    * Returns (groupCols..., n_a, n_b, mean_a, mean_b, var_a, var_b,
    * t_stat). */
  def welchTwoSample(df: DataFrame, groupCols: Seq[String],
                     variantCol: String, valueCol: String,
                     scale: Long = 100L): DataFrame = {
    require(scale >= 1, "scale must be >= 1")
    def finite(c: String) = {
      val d = col(c).cast("double")
      col(c).isNotNull && !isnan(d) && abs(d) <= Double.MaxValue
    }
    val (vD, vL) = fixedLanes(valueCol, scale)
    val isA = col(variantCol) === 0
    // NULL variants are excluded outright: `=== 0` would silently route
    // them to the B side while a SQL `<> 0` replay drops them — the
    // engine must not depend on that divergence. Moments ride the
    // Sum128 long fast path with the decimal lane for out-of-range rows
    // (see groupedCorrSlope).
    val m = df.filter(finite(valueCol) && col(variantCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(when(isA, 1L).otherwise(0L)).cast(Dec).as("na"),
        sum(when(!isA, 1L).otherwise(0L)).cast(Dec).as("nb"),
        valueSum(isA, vL, vD).as("sa"),
        valueSum(!isA, vL, vD).as("sb"),
        momentSum(isA, vL, vL, vD, vD).as("qa"),
        momentSum(!isA, vL, vL, vD, vD).as("qb"))
    def mean(s: String, n: String) =
      (col(s).cast("double") / col(n).cast("double")) / scale
    def variance(n: String, s: String, q: String) =
      ((col(n) * col(q) - col(s) * col(s)).cast("double") /
        (col(n) * (col(n) - 1)).cast("double")) / (scale * scale)
    val meanA = mean("sa", "na"); val meanB = mean("sb", "nb")
    val varA = variance("na", "sa", "qa"); val varB = variance("nb", "sb", "qb")
    val se2 = varA / col("na").cast("double") + varB / col("nb").cast("double")
    m.select(groupCols.map(col) ++ Seq(
      col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
      when(col("na") > 0, meanA).as("mean_a"),
      when(col("nb") > 0, meanB).as("mean_b"),
      when(col("na") > 1, varA).as("var_a"),
      when(col("nb") > 1, varB).as("var_b"),
      when(col("na") > 1 && col("nb") > 1 && se2 > 0.0,
        (meanA - meanB) / sqrt(se2)).as("t_stat")): _*)
  }

  /** Cumulative Poisson(1) CDF at k = 0..8, as DIGIT STRINGS — both the
    * Spark literals and the SQL oracle parse the same text, so both
    * engines hold the identical double and the multiplicity chain below
    * is engine-exact. Tail mass beyond 9 (< 1.2e-6) maps to 9. */
  private[graft] val PoissonCdf: Seq[String] = Seq(
    "0.36787944117144233", "0.7357588823428847", "0.9196986029286058",
    "0.9810118431238463", "0.9963401531726563", "0.9994058151824183",
    "0.999916758850712", "0.9999897508033253", "0.999998874797402")

  /** Percentile-bootstrap confidence interval for a column MEAN with
    * NO randomness and NO driver loop: replicate r's multiplicity for
    * row i is Poisson(1)⁻¹ of the md5-derived exact uniform
    * u(i, r) = (first-13-hex(md5("id:r:seed")) + 0.5) / 2⁵²
    * ([[graft.ops.Sampling.weightedSample]]'s uniform convention) — a
    * pure function of (id, r, seed), so the whole resampling replays in
    * SQL and survives retries/repartitioning bit-for-bit. Replicate
    * sums accumulate in DECIMAL(38,0) over fixed-point cents
    * (order-free); each replicate mean is two IEEE divisions; the CI is
    * an order statistic of the SORTED b means (kLo = max(1,
    * floor(b·α/2)), kHi = b+1−kLo, 1-based).
    *
    * Scale shape: ONE pass over b×n expression-replicated rows
    * (map-side combined into ≤ b partials per partition — the shuffle
    * carries partitions × b rows), then all CI arithmetic on the b-row
    * frame via one bounded collect_list. Cost is b× the plain mean's
    * scan work — b is a fixed constant (default 200), stated rather
    * than hidden.
    *
    * Returns ONE row: (n_rows, b, mean, ci_lo, ci_hi). */
  def bootstrapMeanCI(df: DataFrame, idCol: String, valueCol: String,
                      b: Int = 200, alpha: Double = 0.05,
                      scale: Long = 100L, seed: Long = 42L): DataFrame = {
    require(b >= 2, s"b must be >= 2, got $b")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    def finite(c: String) = {
      val d = col(c).cast("double")
      col(c).isNotNull && !isnan(d) && abs(d) <= Double.MaxValue
    }
    val (bvD, bvL) = fixedLanes(valueCol, scale)
    val base = df.filter(finite(valueCol))
      .select(col(idCol).as("__id"), bvD.as("__vd"), bvL.as("__v"))

    val rep = base.select(col("__id"), col("__vd"), col("__v"),
      explode(sequence(lit(1), lit(b))).as("r"))
    val h52 = conv(substring(Composition.shuffleKey(
        concat(col("__id").cast("string"), lit(":"), col("r").cast("string")),
        seed), 1, 13), 16, 10).cast("long")
    val u = (h52.cast("double") + lit(0.5)) / lit(4503599627370496.0) // 2^52
    val m = PoissonCdf.zipWithIndex
      .foldLeft(when(lit(false), 0)) { case (chain, (cdf, k)) =>
        chain.when(u < lit(cdf.toDouble), k)
      }.otherwise(9).cast("long")

    // v·m routes by magnitude like every moment: the long lane while
    // |v·m| clears 4e18 (m <= 9), the exact decimal lane past it
    val means = rep.withColumn("__m", m)
      .groupBy("r")
      .agg(momentSum(lit(true), col("__v"), col("__m"),
          col("__vd"), col("__m").cast(Dec)).as("__sv"),
        sum("__m").as("__sm"))
      .select(when(col("__sm") > 0,
        (col("__sv").cast("double") / col("__sm").cast("double")) / scale)
        .as("__mean"))

    val kLo = math.max(1, (b * alpha / 2).toInt)
    val kHi = b + 1 - kLo
    val point = base.agg(count(lit(1)).as("n_rows"),
      ((valueSum(lit(true), col("__v"), col("__vd")).cast("double")
        / count(lit(1)).cast("double")) / scale)
        .as("mean"))
    means.agg(sort_array(collect_list(col("__mean"))).as("__s"))
      .crossJoin(broadcast(point))
      .select(col("n_rows"), lit(b).as("b"), col("mean"),
        element_at(col("__s"), kLo).as("ci_lo"),
        element_at(col("__s"), kHi).as("ci_hi"))
  }
}
