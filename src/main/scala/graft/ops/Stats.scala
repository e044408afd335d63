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

  /** round(value·scale) as a LONG. Values past 4e18 raise loudly — at
    * scale = 100 that is a 4e16 raw value, and the ROUNDING ITSELF
    * (double multiply) stops being exact past 2⁵³ ≈ 9e15, so nothing
    * exact is ever lost at this guard (the double compare at 4e18 is
    * itself exact: 2.3× margin over the estimate's ulp error). */
  private def fixedLong(cn: String, scale: Long): Column = {
    val scaled = round(col(cn) * scale)
    when(abs(scaled) <= lit(4.0e18), scaled.cast("long"))
      .otherwise(raise_error(lit(s"Stats: |$cn * $scale| exceeds the " +
        "4e18 exact-long range - reduce scale")).cast("long"))
  }

  /** Per-row moment product in LONG with an EXACT overflow check (the
    * division identity, two long ops — not a conservative double
    * estimate): every product the 64-bit lane can express is accepted,
    * so the supported domain is |a·b| < 2⁶³ ≈ 9.2e18 — at scale = 100
    * that covers squares of ~$30M-unit values (the r13 review's $20M
    * scenario clears at 4e18). Past it the error is loud and names the
    * fix (a smaller `scale`); the all-decimal r12 form computed larger
    * products but paid a serialized-BigDecimal buffer per row — 3×
    * the scan cost — and two exact-lane alternatives (a decimal rare
    * lane, a two-limb Sum128 rare lane) measured 2.2-3.0 s vs 0.6 s on
    * the sf0.1 moments scan even with ZERO rare rows (NOTES_r13). */
  private def exactProduct(a: Column, b: Column): Column = {
    // try_multiply is NULL exactly on 64-bit overflow (Math.multiplyExact
    // under the hood, ANSI-independent) — inputs are non-null by
    // construction (fixedLong), so NULL here can only mean overflow
    val t = try_multiply(a, b)
    when(t.isNotNull, t)
      .otherwise(raise_error(lit("Stats: per-row moment product " +
        "exceeds the exact 64-bit range (2^63) - reduce scale"))
        .cast("long"))
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
    // per row (measured 3x this form on the sf0.1 moments scan). The
    // per-row domain is exact-64-bit with LOUD errors past it
    // ([[exactProduct]] — the division-identity check, never a wrap).
    val x = fixedLong(xCol, scale)
    val y = fixedLong(yCol, scale)
    def finite(c: String) = {
      val d = col(c).cast("double")
      col(c).isNotNull && !isnan(d) && abs(d) <= Double.MaxValue
    }
    import graft.functions.Sum128.sum128
    val filtered = df.filter(finite(xCol) && finite(yCol))
    val m = filtered
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast(Dec).as("n"),
        sum128(x).as("sx"), sum128(y).as("sy"),
        sum128(exactProduct(x, x)).as("sxx"),
        sum128(exactProduct(y, y)).as("syy"),
        sum128(exactProduct(x, y)).as("sxy"))
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
    import graft.functions.Sum128.sum128
    val v = fixedLong(valueCol, scale)
    val vv = exactProduct(v, v)
    val isA = col(variantCol) === 0
    // NULL variants are excluded outright: `=== 0` would silently route
    // them to the B side while a SQL `<> 0` replay drops them — the
    // engine must not depend on that divergence. Moments ride the
    // Sum128 long fast path ([[exactProduct]] domain contract).
    val m = df.filter(finite(valueCol) && col(variantCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(when(isA, 1L).otherwise(0L)).cast(Dec).as("na"),
        sum(when(!isA, 1L).otherwise(0L)).cast(Dec).as("nb"),
        sum128(when(isA, v).otherwise(lit(0L))).as("sa"),
        sum128(when(!isA, v).otherwise(lit(0L))).as("sb"),
        sum128(when(isA, vv).otherwise(lit(0L))).as("qa"),
        sum128(when(!isA, vv).otherwise(lit(0L))).as("qb"))
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
    // the ×b replication below amplifies every input row b-fold, and the
    // per-replicate draw hash is the dominant CPU — widen a single-split
    // scan first so the explode+hash stage runs at session parallelism
    // (Par.widen: no-op on a well-split corpus; 16-byte rows here)
    val base = Par.widen(
      df.filter(finite(valueCol))
        .select(col(idCol).as("__id"), fixedLong(valueCol, scale).as("__v")),
      col("__id"))

    val rep = base.select(col("__id"), col("__v"),
      explode(sequence(lit(1), lit(b))).as("r"))
    val h52 = conv(substring(Composition.shuffleKey(
        concat(col("__id").cast("string"), lit(":"), col("r").cast("string")),
        seed), 1, 13), 16, 10).cast("long")
    val u = (h52.cast("double") + lit(0.5)) / lit(4503599627370496.0) // 2^52
    val m = PoissonCdf.zipWithIndex
      .foldLeft(when(lit(false), 0)) { case (chain, (cdf, k)) =>
        chain.when(u < lit(cdf.toDouble), k)
      }.otherwise(9).cast("long")

    // v·m on the exact 64-bit lane: m <= 9 and |v| <= 4e18 means the
    // product can reach 3.6e19 only past |v| = 1e18 — exactProduct's
    // division-identity check raises loudly there instead of wrapping
    import graft.functions.Sum128.sum128
    val means = rep.withColumn("__m", m)
      .groupBy("r")
      .agg(sum128(exactProduct(col("__v"), col("__m"))).as("__sv"),
        sum("__m").as("__sm"))
      .select(when(col("__sm") > 0,
        (col("__sv").cast("double") / col("__sm").cast("double")) / scale)
        .as("__mean"))

    val kLo = math.max(1, (b * alpha / 2).toInt)
    val kHi = b + 1 - kLo
    val point = base.agg(count(lit(1)).as("n_rows"),
      ((sum128(col("__v")).cast("double") / count(lit(1)).cast("double"))
        / scale).as("mean"))
    means.agg(sort_array(collect_list(col("__mean"))).as("__s"))
      .crossJoin(broadcast(point))
      .select(col("n_rows"), lit(b).as("b"), col("mean"),
        element_at(col("__s"), kLo).as("ci_lo"),
        element_at(col("__s"), kHi).as("ci_hi"))
  }
}
