package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling — the reproducibility-critical alternative to
  * `df.sample()` for training-data pipelines: `sample()` draws from a
  * per-partition RNG, so results change with partitioning, task retries,
  * and Spark versions; these operators decide membership from row
  * CONTENT, so a sample is stable across runs, cluster layouts, and
  * re-executions (and two teams sampling the same corpus get the same
  * rows).
  */
object Sampling {

  val Buckets = 1000000L

  /** Hash-based Bernoulli sample: keep rows where
    * `xxhash64(keys) mod 1e6 < fraction·1e6`. Per-row membership is a
    * pure function of the key columns. */
  def hashSample(df: DataFrame, keyCols: Seq[String], fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    df.filter(bucketOf(keyCols.map(col)) < (fraction * Buckets).toLong)
  }

  private def bucketOf(keys: Seq[Column]): Column =
    pmod(xxhash64(keys: _*), lit(Buckets))

  /** Stratified deterministic sample: per-stratum fractions, hash-based
    * membership within each stratum (`fractions` maps stratum value →
    * fraction; absent strata use `default`). */
  def stratifiedHashSample(df: DataFrame, strataCol: String, keyCols: Seq[String],
                           fractions: Map[String, Double],
                           default: Double = 0.0): DataFrame = {
    val cut = fractions.foldLeft(lit((default * Buckets).toLong)) {
      case (acc, (value, f)) =>
        when(col(strataCol) === value, lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.filter(bucketOf(keyCols.map(col)) < cut)
  }

  /** Systematic sample on an integer key: keep rows where
    * `key mod every < take` — the fully SQL-portable deterministic sample
    * (exactly mirrored by the DuckDB oracle). */
  def systematicSample(df: DataFrame, keyCol: String, every: Long, take: Long): DataFrame = {
    require(every > 0 && take >= 0 && take <= every)
    df.filter(pmod(col(keyCol), lit(every)) < take)
  }

  /** Exact-k per stratum: the k rows of each stratum whose
    * [[Composition.shuffleKey]] sorts first — the balanced-eval-set
    * primitive (equal-size per-language/per-source panels), deterministic
    * in (id, seed) like every sampler here. One window per stratum
    * (parallel across strata; the md5 key is collision-free, so the
    * selection is total-order unambiguous without a tiebreak). */
  def stratumTopK(df: DataFrame, strataCol: String, idCol: String, k: Int,
                  seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 0, "k >= 0")
    val w = Window.partitionBy(col(strataCol)).orderBy(col("__skey"))
    df.withColumn("__skey", Composition.shuffleKey(col(idCol), seed))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__skey", "__rn")
  }

  /** Weighted sampling without replacement — the Efraimidis–Spirakis
    * exponential-race scheme (public algorithm, "Weighted random
    * sampling with a reservoir", IPL 2006): keep the `k` rows with the
    * SMALLEST priority `-ln(u)/w`, i.e. the first k arrivals of
    * independent Exponential(w) clocks — heavier rows win
    * proportionally more often. The quality-weighted subsetting
    * primitive of data recipes ("sample 1M docs ∝ quality^α": pass the
    * powered score as the weight).
    *
    * Deterministic like every sampler here: `u` derives from the row's
    * md5 key — the first 13 hex digits as an integer h ∈ [0, 2⁵²), then
    * `u = (h + 0.5) / 2⁵²` ∈ (0, 1), in which the add and the
    * power-of-two divide are EXACT IEEE steps, so `u` is bit-identical
    * on any engine; ln is the only libm step and the priority column is
    * internal (dropped from output). Rows with weight ≤ 0 never
    * qualify. Scale shape: `orderBy(...).limit(k)` plans a distributed
    * TakeOrdered (per-partition top-k, bounded merge) — no
    * single-partition sort at any input size. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String, k: Int,
                     seed: Long = 42L): DataFrame = {
    require(k >= 0, "k >= 0")
    val h52 = conv(substring(Composition.shuffleKey(col(idCol), seed), 1, 13),
      16, 10).cast("long")
    val u = (h52.cast("double") + lit(0.5)) / lit(4503599627370496.0) // 2^52
    df.filter(col(weightCol) > 0)
      .withColumn("__wpri", -log(u) / col(weightCol).cast("double"))
      .orderBy(col("__wpri"))
      .limit(k)
      .drop("__wpri")
  }

  /** Deterministic corpus mixing by UP-sampling: repeat each row
    * `repeats(stratum)` times (default `default`), tagged with a
    * `copy_idx` — the "N epochs of source X" mixture weighting every
    * LLM data recipe applies to high-quality sources. One `explode`
    * over a per-row `sequence`, no shuffle; repetition lands adjacent
    * to the original row, so downstream `repartition` decides placement
    * explicitly. Strata with repeat 0 drop out (sequence(1,0) is empty —
    * doubling as a coarse filter). */
  def repeatByStratum(df: DataFrame, strataCol: String,
                      repeats: Map[String, Int], default: Int = 1): DataFrame = {
    require((repeats.values ++ Seq(default)).forall(_ >= 0), "repeats >= 0")
    val n = repeats.foldLeft(lit(default)) { case (acc, (v, r)) =>
      when(col(strataCol) === v, lit(r)).otherwise(acc)
    }
    // guard the zero case: Spark's sequence(1, 0) steps DOWNWARD ([1,0]),
    // it is not empty like DuckDB's generate_series(1, 0)
    df.withColumn("copy_idx",
      explode(when(n > 0, sequence(lit(1), n))
        .otherwise(array().cast("array<int>"))))
  }
}
