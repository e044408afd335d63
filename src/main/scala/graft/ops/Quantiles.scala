package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed quantiles over integral columns — the corpus-audit
  * primitive behind "filter docs below the p10 quality length" style
  * sweeps.
  *
  * The usual exact route (global sort, or a single-partition window) is
  * a 100 TB scale-killer, and `approx_percentile` is neither exact nor
  * engine-reproducible. This is the distributed selection algorithm
  * instead: each pass histograms the surviving value range into `bins`
  * equal-width buckets with ONE map-side-combined aggregation, locates
  * the bucket holding the k-th value, and recurses into it. The value
  * range shrinks by ~`bins`× per pass, so a full 64-bit range needs at
  * most ⌈64/log₂bins⌉ = 7 passes at the default 1024 bins; each pass
  * ships `bins` counters to the driver, never data rows. No sort, no
  * repartition-to-1, no collect of values.
  */
object Quantiles {

  /** Exact k-th smallest (1-based, duplicates counted) of integral
    * column `valueCol`. Requires 1 ≤ k ≤ count; one aggregate action per
    * refinement pass plus one bounds scan. */
  def exactKth(df: DataFrame, valueCol: String, k: Long, bins: Int = 1024): Long = {
    val (lo, hi, n) = bounds(df, valueCol)
    selectKth(df, valueCol, k, lo, hi, n, bins)
  }

  /** Saturating `a + b` for the refinement upper bound: when the
    * surviving range abuts Long.MaxValue (a column containing it),
    * `newLo + width - 1` would wrap negative and silently return a wrong
    * quantile — saturate to MaxValue instead (the outer `min(hi, _)`
    * then restores the true bound). */
  private def satAdd(a: Long, b: Long): Long = {
    val s = a + b
    if (((a ^ s) & (b ^ s)) < 0L) { if (a >= 0) Long.MaxValue else Long.MinValue }
    else s
  }

  /** One (min, max, count) scan — shared by all selections over the same
    * column so multi-quantile calls don't rescan per rank. */
  private def bounds(df: DataFrame, valueCol: String): (Long, Long, Long) = {
    val v = col(valueCol).cast("long")
    val b = df.agg(min(v).as("lo"), max(v).as("hi"), count(v).as("n")).head()
    require(!b.isNullAt(0), "column has no non-null values")
    (b.getLong(0), b.getLong(1), b.getLong(2))
  }

  private def selectKth(df: DataFrame, valueCol: String, k: Long,
                        initLo: Long, initHi: Long, n: Long, bins: Int): Long = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(k <= n, s"k=$k exceeds count=$n")
    val v = col(valueCol).cast("long")
    var lo = initLo
    var hi = initHi
    var kk = k
    // a range spanning both signs can overflow (hi - lo) and (v - lo):
    // split at zero first (one count job), then each side spans < 2^63
    if (lo < 0 && hi > 0) {
      val nNeg = df.filter(v >= lo && v < 0).count()
      if (kk <= nNeg) hi = -1L else { kk -= nNeg; lo = 0L }
    }
    while (lo < hi) {
      // ceil-div keeps bucket count <= bins; after the zero-split both
      // bounds share a sign so (hi - lo) can't wrap, and the upper-bound
      // update saturates (satAdd) so a range abutting Long.MaxValue is safe
      val width = math.max(1L, (hi - lo) / bins + 1L)
      // integer `div`, NOT `/`: Spark's `/` on longs is double division,
      // which loses exactness above 2^53
      val hist = df.select(v.as("__v")).filter(col("__v") >= lo && col("__v") <= hi)
        .groupBy(expr(s"(__v - ${lo}L) div ${width}L").as("b"))
        .agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      var cum = 0L
      var i = 0
      while (cum + hist(i)._2 < kk) { cum += hist(i)._2; i += 1 }
      kk -= cum
      val b = hist(i)._1
      val newLo = lo + b * width
      hi = math.min(hi, satAdd(newLo, width - 1))
      lo = newLo
    }
    lo
  }

  /** All requested ranks selected TOGETHER: one aggregation job per
    * refinement round covers every still-active rank (each rank's
    * surviving range joins in as a broadcast row), instead of one job
    * chain per rank — with R ranks and P passes that is P jobs, not
    * R·P. Ranks start from the same global range, so round 1 is shared
    * exactly; later rounds ship R small range rows with the scan.
    * Spark-job fixed overhead dominates these tiny histogram passes, so
    * the batching is a ~R× wall-clock cut (measured 3.7s → ~1.4s for 3
    * ranks over 100k rows at sf0.1). */
  private def selectManyKth(df: DataFrame, valueCol: String, ks: Seq[Long],
                            initLo: Long, initHi: Long, n: Long,
                            bins: Int): Map[Long, Long] = {
    ks.foreach { k =>
      require(k >= 1, s"k must be >= 1, got $k")
      require(k <= n, s"k=$k exceeds count=$n")
    }
    selectManyFromState(df, valueCol,
      ks.distinct.map(k => k -> ((initLo, initHi, k))).toMap, bins)
  }

  /** The refinement loop over EXPLICIT per-rank state — each entry is
    * `rank -> (lo, hi, kk)` asserting "the global `rank`-th value is the
    * `kk`-th smallest of the values in [lo, hi]". [[selectManyKth]] seeds
    * every rank with the full range; [[exactQuantilesSeeded]] seeds each
    * rank with a sketch-narrowed bracket. Ranges spanning both signs are
    * split at zero first (one shared broadcast-join count job) so
    * `(hi - lo)` and `(v - lo)` can't overflow. */
  private def selectManyFromState(df: DataFrame, valueCol: String,
                                  state0: Map[Long, (Long, Long, Long)],
                                  bins: Int): Map[Long, Long] = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valueCol).cast("long")
    var state = state0
    val straddling = state.filter { case (_, (lo, hi, _)) => lo < 0 && hi > 0 }
    if (straddling.nonEmpty) {
      val negRanges = straddling.map { case (k, (lo, _, _)) => (k, lo) }
        .toSeq.toDF("qk", "nlo")
      val negCounts = df.select(v.as("__v")).filter(col("__v") < 0)
        .join(broadcast(negRanges), col("__v") >= col("nlo"))
        .groupBy("qk").agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      state = state.map {
        case (k, (lo, hi, kk)) if lo < 0 && hi > 0 =>
          val nNeg = negCounts.getOrElse(k, 0L)
          k -> (if (kk <= nNeg) (lo, -1L, kk) else (0L, hi, kk - nNeg))
        case other => other
      }
    }
    while (state.exists { case (_, (lo, hi, _)) => lo < hi }) {
      val active = state.filter { case (_, (lo, hi, _)) => lo < hi }
      val ranges = active.map { case (k, (lo, hi, _)) =>
        (k, lo, hi, math.max(1L, (hi - lo) / bins + 1L))
      }.toSeq.toDF("qk", "lo", "hi", "width")
      val hists = df.select(v.as("__v"))
        .join(broadcast(ranges),
          col("__v") >= col("lo") && col("__v") <= col("hi"))
        .groupBy(col("qk"), expr("(__v - lo) div width").as("b"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.map(r => r.getLong(1) -> r.getLong(2)).sortBy(_._1))
        .toMap
      state = state.map {
        case (k, s @ (lo, hi, _)) if lo >= hi => k -> s
        case (k, (lo, hi, kk)) =>
          val width = math.max(1L, (hi - lo) / bins + 1L)
          val hist = hists(k)
          var cum = 0L
          var i = 0
          while (cum + hist(i)._2 < kk) { cum += hist(i)._2; i += 1 }
          val newLo = lo + hist(i)._1 * width
          k -> (newLo, math.min(hi, satAdd(newLo, width - 1)), kk - cum)
      }
    }
    state.map { case (k, (lo, _, _)) => k -> lo }
  }

  /** Exact quantiles at ranks ⌈q·n⌉ (percentile-disc style, lower
    * rounding via ⌈⌉ on the 1-based rank). Returns (q, value) pairs;
    * ONE bounds scan and one batched selection for ALL ranks. */
  def exactQuantiles(df: DataFrame, valueCol: String,
                     qs: Seq[Double]): Seq[(Double, Long)] = {
    val (lo, hi, n) = bounds(df, valueCol)
    qs.foreach(q => require(q > 0.0 && q <= 1.0, s"quantile out of (0,1]: $q"))
    val ks = qs.map(q => math.max(1L, math.ceil(q * n).toLong))
    val selected = selectManyKth(df, valueCol, ks, lo, hi, n, bins = 1024)
    qs.zip(ks).map { case (q, k) => q -> selected(k) }
  }

  /** [[exactQuantiles]] accelerated by a one-pass GK sketch — SAME exact
    * result, fewer scans on wide-range columns.
    *
    * The plain refinement needs ⌈log₁₀₂₄(range)⌉ full-column passes — up
    * to 7 when the value range spans 64 bits (ids, hashes, timestamps in
    * nanos). This variant first runs Spark's `approxQuantile`
    * (Greenwald–Khanna, deterministic rank guarantee: the value returned
    * for quantile φ has exact rank within ±ε·n of φ·n) at φ = q ∓ 2ε to
    * BRACKET each target value, then verifies the bracket with one exact
    * counting job and runs the refinement inside it — usually a 1-pass
    * range. Correctness never rests on the sketch: a bracket the count
    * job disproves (or NaN from an all-null projection) falls back to the
    * full range for that rank, so the output is bit-identical to
    * [[exactQuantiles]] in every case.
    *
    * Job count: 1 bounds + 1 sketch + 1 bracket-verify + ~1 refinement
    * vs 1 bounds + up-to-7 refinements — worth it exactly when the range
    * is wide and the cluster is large (each pass is a full scan); for
    * narrow ranges (e.g. document lengths, ≤ 2 passes) the constant-factor
    * difference is noise. The doubles inside the sketch cannot break
    * exactness above 2⁵³ either — bracket endpoints are widened by one ulp
    * before use. */
  def exactQuantilesSeeded(df: DataFrame, valueCol: String, qs: Seq[Double],
                           relativeError: Double = 0.01,
                           bins: Int = 1024): Seq[(Double, Long)] = {
    require(relativeError > 0 && relativeError < 0.25,
      s"relativeError out of (0, 0.25): $relativeError")
    qs.foreach(q => require(q > 0.0 && q <= 1.0, s"quantile out of (0,1]: $q"))
    val spark = df.sparkSession
    import spark.implicits._
    val (lo, hi, n) = bounds(df, valueCol)
    val ks = qs.map(q => math.max(1L, math.ceil(q * n).toLong))
    val ksDistinct = ks.distinct
    val qByK = qs.zip(ks).toMap.map(_.swap) // any representative q per rank

    // one GK pass brackets every rank: sketch at φ = q ∓ 2ε, so the
    // bracket endpoints' true ranks sit at least ε·n beyond the target
    // on each side (clamped at the extremes to the exact global bounds)
    val v = col(valueCol).cast("long")
    val probes = ksDistinct.flatMap { k =>
      val q = qByK(k)
      Seq(math.max(0.0, q - 2 * relativeError),
        math.min(1.0, q + 2 * relativeError))
    }
    val sketch = df.select(v.cast("double").as("__d"))
      .stat.approxQuantile("__d", probes.toArray, relativeError)
    val brackets = ksDistinct.zipWithIndex.map { case (k, i) =>
      k -> ((bracketLong(sketch(2 * i), lo, hi, up = false),
        bracketLong(sketch(2 * i + 1), lo, hi, up = true)))
    }.toMap

    // one exact job verifies every bracket: below = #{v < blo},
    // inRange = #{blo ≤ v ≤ bhi}; the global k-th value lies in the
    // bracket iff 1 ≤ k − below ≤ inRange, and then it is the
    // (k − below)-th smallest there
    val ranges = brackets.toSeq.map { case (k, (blo, bhi)) => (k, blo, bhi) }
      .toDF("qk", "blo", "bhi")
    val cnts = df.select(v.as("__v")).join(broadcast(ranges),
        col("__v") <= col("bhi"))
      .groupBy("qk").agg(
        sum(when(col("__v") < col("blo"), 1L).otherwise(0L)).as("below"),
        sum(when(col("__v") >= col("blo"), 1L).otherwise(0L)).as("inRange"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val state = ksDistinct.map { k =>
      val (blo, bhi) = brackets(k)
      val (below, inRange) = cnts.getOrElse(k, (0L, 0L))
      val kk = k - below
      if (kk >= 1 && kk <= inRange) k -> ((blo, bhi, kk))
      else k -> ((lo, hi, k)) // sketch bracket disproved: exact fallback
    }.toMap
    val selected = selectManyFromState(df, valueCol, state, bins)
    qs.zip(ks).map { case (q, k) => q -> selected(k) }
  }

  /** Clamp a sketch double to a widened long bound inside [lo, hi]:
    * ±one ulp of padding absorbs the double's representation error (a
    * long above 2⁵³ rounds by up to 1024 when cast), then floor/ceil
    * keeps the bracket a superset. NaN (all-null projection) falls to
    * the exact global bound. */
  private def bracketLong(d: Double, lo: Long, hi: Long, up: Boolean): Long = {
    if (d.isNaN) { if (up) hi else lo }
    else {
      val pad = math.max(1.0, math.ulp(d))
      val x = if (up) d + pad else d - pad
      if (x >= hi.toDouble) hi
      else if (x <= lo.toDouble) lo
      else if (up) math.ceil(x).toLong
      else math.floor(x).toLong
    }
  }

  /** Exact per-group quantile at rank ⌈q·n_g⌉ — the scalable form of a
    * `row_number() over (partition by g)` median: a partitioned window
    * puts each whole group in ONE task (fine for 5 languages at sf0.1,
    * a straggler/OOM once a group holds billions of rows), while this
    * runs the same refinement passes as [[exactQuantiles]] with the
    * histogram keyed by (group, bucket) — every round is ONE
    * map-side-combined aggregation covering ALL still-active groups, so
    * the pass count stays ≤ 7 regardless of group count or skew.
    *
    * Driver state is O(groups) and each round ships ≤ groups·bins
    * counters; `bins` auto-shrinks so that stays ≤ ~2²⁰ per round. Meant
    * for categorical group domains (languages, sources, shards — up to
    * ~10⁵ groups), not high-cardinality keys. Rows with a NULL group key
    * form their own group (SQL GROUP BY semantics); NULL values are
    * ignored (not counted in n_g).
    *
    * Returns (groupCol [original type], value LONG), one row per group. */
  def groupedExactQuantile(df: DataFrame, groupCol: String, valueCol: String,
                           q: Double, bins: Int = 1024): DataFrame =
    groupedExactQuantiles(df, groupCol, valueCol, Seq("value" -> q), bins)

  /** Multiple exact per-group quantiles in ONE shared protocol — the
    * same bounds scan, the same sign-split job, and refinement rounds
    * that cover every still-active (group, rank) pair in one
    * map-side-combined aggregation each. Three separate
    * [[groupedExactQuantile]] calls cost three full protocols over the
    * input; this costs one protocol with a slightly wider histogram key
    * — the [[Scaling.robustScale]] shape (p25/p50/p75) at a third of the
    * passes. `rankSpecs` maps output column name → quantile in (0, 1].
    * Returns one row per group: (groupCol [original type], <name> LONG
    * per rank). */
  def groupedExactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                            rankSpecs: Seq[(String, Double)],
                            bins: Int = 1024): DataFrame =
    groupedExactQuantilesImpl(df, groupCol, valueCol, rankSpecs, bins, None)

  /** [[groupedExactQuantiles]] accelerated by one grouped
    * `percentile_approx` pass — SAME exact result (bit-for-bit): the
    * sketch only BRACKETS each (group, rank) target, one exact count
    * job verifies every bracket, and disproved brackets fall back to
    * the full range for that (group, rank). Worth it exactly when the
    * value range is wide — ~7 full refinement passes collapse to
    * sketch + verify + ~1 refine. [[groupedExactQuantileDouble]] seeds
    * by default: IEEE-bits-mapped doubles always span a wide long
    * range. Narrow integral columns (document lengths: ≤ 2 passes
    * unseeded) should stay on the plain form — the sketch pass costs
    * more than it saves there. */
  def groupedExactQuantilesSeeded(df: DataFrame, groupCol: String,
                                  valueCol: String,
                                  rankSpecs: Seq[(String, Double)],
                                  relativeError: Double = 0.01,
                                  bins: Int = 1024): DataFrame = {
    require(relativeError > 0 && relativeError < 0.25,
      s"relativeError out of (0, 0.25): $relativeError")
    groupedExactQuantilesImpl(df, groupCol, valueCol, rankSpecs, bins,
      Some(relativeError))
  }

  private def groupedExactQuantilesImpl(
      df: DataFrame, groupCol: String, valueCol: String,
      rankSpecs: Seq[(String, Double)], bins: Int,
      seedRelError: Option[Double]): DataFrame = {
    require(rankSpecs.nonEmpty, "need at least one rank")
    rankSpecs.foreach { case (name, q) =>
      require(q > 0.0 && q <= 1.0, s"quantile out of (0,1]: $name=$q") }
    require(rankSpecs.map(_._1).distinct.size == rankSpecs.size,
      s"duplicate rank names in ${rankSpecs.map(_._1)}")
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val v = col(valueCol).cast("long")
    val g = col(groupCol)

    // when seeding, the sketch rides the SAME aggregation as the bounds
    // scan (min/max/count/percentile_approx in one grouped agg) — one
    // action instead of two, and the sketch pass stops being a separate
    // full scan (outlier detection runs this protocol twice per call)
    val seedProbes = seedRelError.map { re =>
      rankSpecs.flatMap { case (_, q) =>
        Seq(math.max(0.0, q - 2 * re), math.min(1.0, q + 2 * re)) }
    }
    val baseAggs = Seq(min(v).as("lo"), max(v).as("hi"), count(v).as("n"))
    val aggsWithSketch = seedProbes match {
      case Some(probes) =>
        val acc = math.max(100, math.ceil(1.0 / seedRelError.get).toInt)
        val probesSql = probes.mkString("array(", ",", ")")
        baseAggs :+ expr(
          s"percentile_approx(CAST(`$valueCol` AS BIGINT), $probesSql, $acc)")
          .as("__ps")
      case None => baseAggs
    }
    val boundsRows = df.groupBy(g.as("__g"))
      .agg(aggsWithSketch.head, aggsWithSketch.tail: _*).collect()
    // groups with only NULL values have no quantile; drop them like
    // exactKth's require, but per-group and non-fatal. State is keyed by
    // (group value, rank name) — each rank refines its own range.
    var state: Map[(Any, String), (Long, Long, Long)] = boundsRows.iterator
      .filter(r => !r.isNullAt(1) && r.getLong(3) > 0)
      .flatMap { r =>
        rankSpecs.map { case (name, q) =>
          val k = math.max(1L, math.ceil(q * r.getLong(3)).toLong)
          (r.get(0), name) -> ((r.getLong(1), r.getLong(2), k))
        }
      }.toMap
    val effBins = math.max(16, math.min(bins, (1 << 20) / math.max(1, state.size)))
    val groupField = df.select(g).schema.head.copy(name = "__g")

    // sketch-seeded bracketing (groupedExactQuantilesSeeded): the fused
    // sketch at φ = q ∓ 2ε brackets every (group, rank), one exact count
    // job verifies all brackets, disproved brackets keep the full range —
    // output identical either way (the exactQuantilesSeeded protocol,
    // grouped). Bracket endpoints widen by one ulp (bracketLong) so the
    // long→double conversion of wide bits-values can't shave the target.
    seedRelError.foreach { _ =>
      val sk = boundsRows.iterator
        .filter(r => !r.isNullAt(1) && !r.isNullAt(4))
        .map(r => r.get(0) -> r.getSeq[Long](4)).toMap
      val groupBounds = boundsRows.iterator.filter(r => !r.isNullAt(1))
        .map(r => r.get(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val brackets: Map[(Any, String), (Long, Long)] = state.keys.flatMap {
        case key @ (gv, name) =>
          sk.get(gv).map { ps =>
            val idx = rankSpecs.indexWhere(_._1 == name)
            val (glo, ghi) = groupBounds(gv)
            key -> ((bracketLong(ps(2 * idx).toDouble, glo, ghi, up = false),
              bracketLong(ps(2 * idx + 1).toDouble, glo, ghi, up = true)))
          }
      }.toMap
      if (brackets.nonEmpty) {
        val vSchema = StructType(Seq(groupField,
          StructField("__rank", StringType),
          StructField("__blo", LongType), StructField("__bhi", LongType)))
        val vRows = brackets.toSeq.map { case ((gv, name), (blo, bhi)) =>
          Row(gv, name, blo, bhi) }
        val cnts = df.select(g.as("__gv"), v.as("__v"))
          .join(broadcast(spark.createDataFrame(
            spark.sparkContext.parallelize(vRows, 1), vSchema)),
            col("__gv") <=> col("__g") && col("__v") <= col("__bhi"))
          .groupBy("__g", "__rank")
          .agg(sum(when(col("__v") < col("__blo"), 1L).otherwise(0L)).as("below"),
            sum(when(col("__v") >= col("__blo"), 1L).otherwise(0L)).as("inR"))
          .collect()
          .map(r => (r.get(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
          .toMap
        state = state.map { case (key, full @ (_, _, k)) =>
          brackets.get(key) match {
            case Some((blo, bhi)) =>
              val (below, inRange) = cnts.getOrElse(key, (0L, 0L))
              val kk = k - below
              if (kk >= 1 && kk <= inRange) key -> ((blo, bhi, kk))
              else key -> full // bracket disproved: exact fallback
            case None => key -> full
          }
        }
      }
    }

    // a range spanning both signs can overflow (hi-lo) and (v-lo): split
    // the affected (group, rank) ranges at zero with ONE shared count job.
    // Range-aware (counts negatives WITHIN each state's [lo, 0) — a seeded
    // bracket's rank is relative to the bracket, not the group).
    if (state.values.exists { case (lo, hi, _) => lo < 0 && hi > 0 }) {
      val straddling = state.filter { case (_, (lo, hi, _)) => lo < 0 && hi > 0 }
      val nSchema = StructType(Seq(groupField,
        StructField("__rank", StringType), StructField("__nlo", LongType)))
      val nRows = straddling.map { case ((gv, name), (lo, _, _)) =>
        Row(gv, name, lo) }.toSeq
      val negCounts = df.select(g.as("__gv"), v.as("__v"))
        .filter(col("__v") < 0)
        .join(broadcast(spark.createDataFrame(
          spark.sparkContext.parallelize(nRows, 1), nSchema)),
          col("__gv") <=> col("__g") && col("__v") >= col("__nlo"))
        .groupBy("__g", "__rank").agg(count(lit(1)).as("c"))
        .collect().map(r => (r.get(0), r.getString(1)) -> r.getLong(2)).toMap
      state = state.map {
        case (key, (lo, hi, kk)) if lo < 0 && hi > 0 =>
          val nNeg = negCounts.getOrElse(key, 0L)
          key -> (if (kk <= nNeg) (lo, -1L, kk) else (0L, hi, kk - nNeg))
        case other => other
      }
    }

    val rangeSchema = StructType(Seq(groupField,
      StructField("__rank", StringType),
      StructField("__lo", LongType), StructField("__hi", LongType),
      StructField("__width", LongType)))
    while (state.exists { case (_, (lo, hi, _)) => lo < hi }) {
      val active = state.filter { case (_, (lo, hi, _)) => lo < hi }
      val rangeRows = active.map { case ((gv, name), (lo, hi, _)) =>
        Row(gv, name, lo, hi, math.max(1L, (hi - lo) / effBins + 1L))
      }.toSeq
      val ranges = spark.createDataFrame(
        spark.sparkContext.parallelize(rangeRows, 1), rangeSchema)
      // null-safe group equi-join keeps the NULL-key group refining too;
      // a row lands in every rank's still-active range it intersects
      // (ranks of one group overlap early and diverge as they converge)
      val hists = df.select(g.as("__gv"), v.as("__v"))
        .join(broadcast(ranges), col("__gv") <=> col("__g") &&
          col("__v") >= col("__lo") && col("__v") <= col("__hi"))
        .groupBy(col("__g"), col("__rank"), expr("(__v - __lo) div __width").as("b"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .groupBy(r => (r.get(0), r.getString(1)))
        .view.mapValues(_.map(r => r.getLong(2) -> r.getLong(3)).sortBy(_._1))
        .toMap
      state = state.map {
        case (key, s @ (lo, hi, _)) if lo >= hi => key -> s
        case (key, (lo, hi, kk)) =>
          val width = math.max(1L, (hi - lo) / effBins + 1L)
          val hist = hists(key)
          var cum = 0L
          var i = 0
          while (cum + hist(i)._2 < kk) { cum += hist(i)._2; i += 1 }
          val newLo = lo + hist(i)._1 * width
          key -> ((newLo, math.min(hi, satAdd(newLo, width - 1)), kk - cum))
      }
    }

    val outSchema = StructType(groupField.copy(name = groupCol) +:
      rankSpecs.map { case (name, _) =>
        StructField(name, LongType, nullable = false) })
    val outRows = state.keys.map(_._1).toSeq.distinct.map { gv =>
      Row.fromSeq(gv +: rankSpecs.map { case (name, _) => state((gv, name))._1 })
    }
    spark.createDataFrame(spark.sparkContext.parallelize(outRows, 1), outSchema)
  }

  /** [[groupedExactQuantile]] for DOUBLE columns: values ride the
    * order-preserving IEEE-bits mapping ([[graft.functions.SortableDoubleBits]],
    * codegen'd) through the grouped selection and map back on the
    * driver — the result frame is per-group (tiny) either way.
    *
    * Seeds by default (`seeded = false` opts out): bits-mapped doubles
    * span a ~2⁶² long range, where the plain refinement pays ~7 full
    * passes and the sketch+verify+refine path pays ~3 — the
    * [[groupedExactQuantilesSeeded]] contract keeps the result
    * bit-identical either way. */
  def groupedExactQuantileDouble(df: DataFrame, groupCol: String, valueCol: String,
                                 q: Double, bins: Int = 1024,
                                 seeded: Boolean = true): DataFrame =
    groupedExactQuantilesDouble(df, groupCol, valueCol, Seq("value" -> q),
      bins, seeded)

  /** Multiple exact per-group DOUBLE quantiles in one shared protocol —
    * the multi-rank [[groupedExactQuantileDouble]]: all ranks ride the
    * IEEE-bits mapping through ONE grouped selection (seeded by default
    * — bits ranges are always wide) and map back on the driver. One row
    * per group: (groupCol, <name> DOUBLE per rank). */
  def groupedExactQuantilesDouble(df: DataFrame, groupCol: String,
                                  valueCol: String,
                                  rankSpecs: Seq[(String, Double)],
                                  bins: Int = 1024,
                                  seeded: Boolean = true): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val spark = df.sparkSession
    // the protocol is EAGER (driver-coordinated rounds), so a persist/
    // unpersist bracket is airtight: every round reads the compact
    // (group, bits) projection from cache instead of re-scanning the
    // source and re-deriving whatever lineage produced `df`.
    // MEMORY_AND_DISK — evictable under pressure, recomputed on miss.
    val mapped = df.select(col(groupCol), graft.functions.SortableDoubleBits
      .sortableDoubleBits(col(valueCol).cast("double")).as("__s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sel =
      try {
        if (seeded)
          groupedExactQuantilesSeeded(mapped, groupCol, "__s", rankSpecs,
            bins = bins)
        else groupedExactQuantiles(mapped, groupCol, "__s", rankSpecs, bins)
      } finally mapped.unpersist(blocking = false)
    val rows = sel.collect().map { r =>
      Row.fromSeq(r.get(0) +: rankSpecs.indices.map(i =>
        graft.functions.SortableDoubleBits.fromSortable(r.getLong(i + 1))))
    }.toSeq
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(sel.schema.head +: rankSpecs.map { case (name, _) =>
        StructField(name, DoubleType, nullable = false) }))
  }

  /** Exact k-th smallest of a DOUBLE column: the values are mapped
    * through the order-preserving IEEE bits transform
    * ([[graft.functions.SortableDoubleBits]], codegen'd), selected as
    * longs, and mapped back — same pass structure and exactness as the
    * integral path (±0.0 compare equal; NaN sorts last, matching SQL
    * ORDER BY). */
  def exactKthDouble(df: DataFrame, valueCol: String, k: Long,
                     bins: Int = 1024): Double = {
    val mapped = df.select(graft.functions.SortableDoubleBits
      .sortableDoubleBits(col(valueCol).cast("double")).as("__s"))
    graft.functions.SortableDoubleBits.fromSortable(
      exactKth(mapped, "__s", k, bins))
  }

  /** [[exactQuantiles]] for DOUBLE columns (ranks ⌈q·n⌉, one bounds
    * scan and one batched selection for ALL ranks). */
  def exactQuantilesDouble(df: DataFrame, valueCol: String,
                           qs: Seq[Double]): Seq[(Double, Double)] = {
    val mapped = df.select(graft.functions.SortableDoubleBits
      .sortableDoubleBits(col(valueCol).cast("double")).as("__s"))
    exactQuantiles(mapped, "__s", qs).map { case (q, s) =>
      q -> graft.functions.SortableDoubleBits.fromSortable(s)
    }
  }
}
