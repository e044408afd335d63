package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus COMPOSITION — the last step between a cleaned corpus and a
  * training run: put documents in a reproducible pseudorandom order, cap
  * each source at a token budget, and interleave sources so no training
  * window sees a single-source run. All three are deterministic functions
  * of (doc id, seed) — re-running the pipeline reproduces the exact same
  * training order, which is what makes data ablations comparable.
  *
  * The randomness primitive is an MD5 hex key of `id:seed` — chosen over
  * a faster hash deliberately: it's computed once per doc (not per pair
  * like the dedup hashes), is bit-identical in every engine that can
  * replay the oracle, and its 128 bits make ordering collisions a
  * non-event at any corpus size.
  */
object Composition {

  /** The deterministic pseudorandom sort key: md5("<id>:<seed>") as hex.
    * Uniform, stable, engine-portable. */
  def shuffleKey(idCol: Column, seed: Long): Column =
    md5(concat(idCol.cast("string"), lit(":"), lit(seed.toString)))

  /** Deterministic corpus shuffle — every doc tagged with its pseudorandom
    * order key. The 100 TB contract: DON'T globally sort here — write with
    * `repartitionByRange($"shuffle_key")` + `sortWithinPartitions`, which
    * realizes the same total order across parallel writers (range
    * boundaries from Spark's sampled partitioner) with no single-partition
    * stage; a training reader consuming files in key order replays the
    * permutation. */
  def shuffled(docs: DataFrame, idCol: String, seed: Long = 42L): DataFrame =
    docs.withColumn("shuffle_key", shuffleKey(col(idCol), seed))

  /** Cap each source at `budgetTokens`: docs are taken in per-source
    * pseudorandom order until the running token total would stay within
    * budget; later docs drop. Deterministic in (id, seed) — the kept set
    * is a function of the corpus, never of execution order.
    *
    * Scale: one window per SOURCE (parallel across sources, shuffle keyed
    * by source). A single web-scale source makes that window's partition
    * the straggler — for that shape, compute the budget cutoff as an
    * exact quantile of the token distribution ([[Quantiles]]) and filter,
    * trading the exact running-sum boundary doc for a fully parallel
    * scan. */
  def tokenBudgetPerSource(docs: DataFrame, idCol: String, sourceCol: String,
                           tokensCol: String, budgetTokens: Long,
                           seed: Long = 42L): DataFrame = {
    val idOrder = Window.partitionBy(col(sourceCol)).orderBy(col("__skey"))
    docs
      .withColumn("__skey", shuffleKey(col(idCol), seed))
      .withColumn("__cum",
        sum(col(tokensCol)).over(idOrder.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("__cum") <= budgetTokens)
      .drop("__skey", "__cum")
  }

  /** 32-hex-digit threshold for cumulative fraction `f`: floor(f·16³²),
    * zero-padded — comparing the md5 key lexicographically against it is
    * a bytewise comparison on both engines, so P(key < threshold) = f to
    * within 16⁻³². Exposed so the differential oracle embeds the SAME
    * literals. */
  private[graft] def hexThreshold(f: Double): String = {
    // Clamp to 2^128-1: a cumulative fraction that rounds to exactly 1.0
    // would otherwise produce a 33-digit hex string, and the "negative pad"
    // would silently mis-sort every key below it.
    val max = (BigInt(1) << 128) - 1
    val t = (BigDecimal(BigInt(1) << 128) * BigDecimal(f)).toBigInt.min(max)
    val hex = t.toString(16)
    ("0" * (32 - hex.length)) + hex
  }

  /** The hex boundary of each non-final split (cumulative fractions
    * through [[hexThreshold]]) — ONE computation shared by
    * [[splitAssign]] and the differential oracle, so engine and oracle
    * compare against bit-identical literals (summing the fractions
    * independently could round the boundary differently). */
  private[graft] def splitBounds(splits: Seq[(String, Double)]): Seq[String] =
    splits.init.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
      .map(hexThreshold)

  /** Deterministic disjoint split assignment (train/val/test and
    * friends): each doc lands in exactly one named split with the given
    * fractions, decided by its md5 key against fixed hex boundaries — a
    * pure per-row function of (id, seed), so membership never changes
    * under repartitioning, re-runs, or corpus growth (a doc's split is
    * decided by its id alone, which is what keeps eval sets stable as
    * the corpus evolves). Fractions must sum to 1. */
  def splitAssign(docs: DataFrame, idCol: String,
                  splits: Seq[(String, Double)], seed: Long = 42L): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got $splits")
    require(splits.forall(_._2 > 0.0),
      s"every split fraction must be > 0 (a 0-fraction split pushes a " +
        s"cumulative boundary to 1.0 exactly), got $splits")
    val key = shuffleKey(col(idCol), seed)
    val assigned = splits.init.zip(splitBounds(splits))
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), bound)) =>
        val cond = key < lit(bound)
        Some(acc.fold(when(cond, lit(name)))(_.when(cond, lit(name))))
      }
    docs.withColumn("split",
      assigned.fold(lit(splits.head._1))(_.otherwise(lit(splits.last._1))))
  }

  /** Deterministic downsample to a TARGET class mix (the domain-
    * reweighting step of training-data composition: "make the kept
    * corpus 40% en / 15% each of the rest"). The kept total is the
    * LARGEST achievable under the target proportions — the scarcest
    * class relative to its target share caps it (m_total =
    * min_c floor(n_c·den/w_c)), every class then keeps
    * m_c = floor(w_c·m_total/den) docs in expectation — and membership
    * is a pure per-row function of (id, seed): a doc is kept iff its
    * 32-bit md5 hash clears the class's rational threshold
    * h·n_c < m_c·2³², ALL integer arithmetic (exact in any engine; kept
    * counts approximate m_c within binomial hash noise, like every
    * hash-threshold sampler here).
    *
    * Classes absent from `targetWeights` are dropped; target classes
    * absent from the corpus are ignored (the mix is over present
    * classes). Scale: one tiny per-class count aggregate, a scalar min,
    * and a broadcast of the |classes|-row threshold frame onto the scan
    * — no window, no global sort. The h·n_c product bounds n_c < 2³¹
    * rows per class; beyond that, widen the comparison to DECIMAL(38,0)
    * on both engines. */
  def reweightToTarget(docs: DataFrame, idCol: String, classCol: String,
                       targetWeights: Seq[(String, Long)],
                       seed: Long = 42L): DataFrame = {
    require(targetWeights.nonEmpty && targetWeights.forall(_._2 > 0L),
      s"target weights must be positive, got $targetWeights")
    val den = targetWeights.map(_._2).sum
    val spark = docs.sparkSession
    val w = spark.createDataFrame(targetWeights).toDF("__cls", "__wt")
    val cnt = docs.groupBy(col(classCol).as("__cls")).agg(count(lit(1)).as("__n"))
    val j = cnt.join(w, "__cls")
    val mt = j.agg(min(expr(s"__n * $den div __wt")).as("__m_total"))
    // |classes| rows × 1 row — the compact-producer broadcast shape
    val th = j.crossJoin(broadcast(mt))
      .select(col("__cls"), col("__n"), expr(s"__wt * __m_total div $den").as("__m"))
    val h = conv(substring(shuffleKey(col(idCol), seed), 1, 8), 16, 10).cast("long")
    docs.join(broadcast(th), col(classCol) === col("__cls"))
      .filter(h * col("__n") < col("__m") * lit(4294967296L))
      .drop("__cls", "__n", "__m")
  }

  /** Source-interleaved training order: docs rank pseudorandomly WITHIN
    * their source, and the global order is (rank, source) — a round-robin
    * through sources, so a contiguous training window mixes sources
    * instead of marching through one corpus at a time. Emits the two
    * order keys (`interleave_rank`, source) rather than sorting: the
    * writer realizes the order with `repartitionByRange` over them, same
    * contract as [[shuffled]]. Per-source windows parallelize across
    * sources. */
  def interleaved(docs: DataFrame, idCol: String, sourceCol: String,
                  seed: Long = 42L): DataFrame = {
    val w = Window.partitionBy(col(sourceCol)).orderBy(col("__skey"))
    docs
      .withColumn("__skey", shuffleKey(col(idCol), seed))
      .withColumn("interleave_rank", row_number().over(w))
      .drop("__skey")
  }

  /** Per-group TOP-p MASS thresholds — the nucleus-sampling analog for
    * corpus curation: for each group, the largest weight value w* such
    * that the rows with weight ≥ w* carry at least p = pNum/pDen of the
    * group's total weight mass. "Keep the highest-quality docs making up
    * 80% of each source's token mass" is this with weight = quality- or
    * token-count.
    *
    * The obvious per-group `sum() over (order by weight desc)` cumsum
    * window puts a web-scale source in ONE task — the straggler/OOM this
    * form exists to avoid. Instead this runs the [[Quantiles]]-style
    * distributed refinement with MASS in place of count: each round is
    * one map-side-combined aggregation histogramming the surviving
    * weight range and summing WEIGHT per bucket, the driver walks
    * buckets top-down to find where the remaining need lands, and the
    * range shrinks ~binsᵏ until one value remains. Driver state is
    * O(groups); rows never leave the cluster. Ties collapse honestly
    * (the threshold is a VALUE — all rows at w* are kept together;
    * splitting them needs a global row numbering).
    *
    * Exactness: need = ⌈total·pNum/pDen⌉ in pure long arithmetic
    * ((total·pNum + pDen − 1) div pDen — exact while total·pNum < 2⁶³,
    * i.e. ~9·10¹⁸ total mass units), bucket walks over exact long mass
    * sums. Weights must be non-negative integers; NULL weights are
    * ignored; all-NULL groups drop.
    *
    * Returns one row per group: (groupCol, threshold, need, total). */
  def topMassThresholds(df: DataFrame, groupCol: String, weightCol: String,
                        pNum: Long, pDen: Long, bins: Int = 1024): DataFrame = {
    require(pNum >= 1 && pDen >= pNum,
      s"need 0 < pNum/pDen <= 1, got $pNum/$pDen")
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val v = col(weightCol).cast("long")
    val g = col(groupCol)

    val boundsRows = df.groupBy(g.as("__g"))
      .agg(min(v).as("lo"), max(v).as("hi"), sum(v).as("total")).collect()
    boundsRows.foreach { r =>
      if (!r.isNullAt(1))
        require(r.getLong(1) >= 0L,
          s"negative weight in group ${r.get(0)}: mass semantics need >= 0")
    }
    // state: group -> (lo, hi, need) asserting "w* is in [lo, hi] and the
    // rows with weight >= w* inside [lo, hi] must carry >= need mass"
    var state: Map[Any, (Long, Long, Long)] = boundsRows.iterator
      .filter(r => !r.isNullAt(1))
      .map { r =>
        val total = r.getLong(3)
        val need = (total * pNum + pDen - 1L) / pDen
        r.get(0) -> ((r.getLong(1), r.getLong(2), need))
      }.toMap
    val totals = boundsRows.iterator.filter(r => !r.isNullAt(1))
      .map(r => r.get(0) -> r.getLong(3)).toMap
    val effBins = math.max(16, math.min(bins, (1 << 20) / math.max(1, state.size)))

    val groupField = df.select(g).schema.head.copy(name = "__g")
    val rangeSchema = StructType(Seq(groupField,
      StructField("__lo", LongType), StructField("__hi", LongType),
      StructField("__width", LongType)))
    while (state.exists { case (_, (lo, hi, _)) => lo < hi }) {
      val active = state.filter { case (_, (lo, hi, _)) => lo < hi }
      val rangeRows = active.map { case (gv, (lo, hi, _)) =>
        Row(gv, lo, hi, math.max(1L, (hi - lo) / effBins + 1L))
      }.toSeq
      val ranges = spark.createDataFrame(
        spark.sparkContext.parallelize(rangeRows, 1), rangeSchema)
      val hists = df.select(g.as("__gv"), v.as("__v"))
        .join(broadcast(ranges), col("__gv") <=> col("__g") &&
          col("__v") >= col("__lo") && col("__v") <= col("__hi"))
        .groupBy(col("__g"), expr("(__v - __lo) div __width").as("b"))
        .agg(sum("__v").as("m"))
        .collect()
        .groupBy(r => r.get(0))
        .view.mapValues(_.map(r => r.getLong(1) -> r.getLong(2))
          .sortBy(-_._1)) // walk buckets TOP-down
        .toMap
      state = state.map {
        case (key, s @ (lo, hi, _)) if lo >= hi => key -> s
        case (key, (lo, hi, need)) =>
          val width = math.max(1L, (hi - lo) / effBins + 1L)
          val hist = hists(key)
          var cum = 0L
          var i = 0
          while (cum + hist(i)._2 < need) { cum += hist(i)._2; i += 1 }
          val b = hist(i)._1
          val newLo = lo + b * width
          // saturating upper bound: a range abutting Long.MaxValue must
          // not wrap (same guard as Quantiles.satAdd; lo >= 0 here, so
          // no sign-split is needed)
          val rawHi = newLo + width - 1L
          val newHi = math.min(hi, if (rawHi < newLo) Long.MaxValue else rawHi)
          key -> ((newLo, newHi, need - cum))
      }
    }

    val outSchema = StructType(groupField.copy(name = groupCol) +:
      Seq(StructField("threshold", LongType, nullable = false),
        StructField("need", LongType, nullable = false),
        StructField("total", LongType, nullable = false)))
    val outRows = state.toSeq.map { case (gv, (lo, _, _)) =>
      val total = totals(gv)
      Row(gv, lo, (total * pNum + pDen - 1L) / pDen, total)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(outRows, 1), outSchema)
  }

  /** Rows carrying the top p = pNum/pDen of each group's weight mass:
    * broadcast the [[topMassThresholds]] frame (group-cardinality) and
    * keep rows with weight ≥ threshold — a map-only filter on the fact
    * side, no window, no row-data shuffle. Adds the group's `threshold`
    * column. */
  def selectTopMass(df: DataFrame, groupCol: String, weightCol: String,
                    pNum: Long, pDen: Long): DataFrame = {
    val th = topMassThresholds(df, groupCol, weightCol, pNum, pDen)
      .select(col(groupCol).as("__g"), col("threshold"))
    df.join(broadcast(th), col(groupCol) <=> col("__g"))
      .filter(col(weightCol).cast("long") >= col("threshold"))
      .drop("__g")
  }
}
