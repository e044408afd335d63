package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** k-anonymity suppression over quasi-identifier columns — the standard
  * release gate for metadata-joined corpora: a row is safe to publish
  * with its quasi-identifiers only when at least `k` rows share the same
  * quasi-identifier combination (Sweeney's k-anonymity). Rows in smaller
  * groups keep flowing (the text/payload is untouched) but their quasi
  * values are masked, so the release never exposes a combination
  * identifying fewer than `k` individuals.
  *
  * Training-data relevance: document corpora routinely carry joined
  * metadata (language, source, length band, license, crawl date); this
  * gate bounds re-identification risk before the metadata ships with the
  * corpus. Generalization (banding a numeric column, truncating a date)
  * is the caller's move — pass pre-generalized columns as `quasi`.
  *
  * Scale posture: one keyed aggregation (map-side partial count → shuffle
  * on the quasi keys) plus one shuffle join back on the same keys — no
  * window over row-level partitions, no driver-side state. The group
  * frame has one row per distinct quasi combination, never per input row.
  */
object Privacy {

  /** Tags every row with its quasi-group size and masks the quasi values
    * of rows whose group has fewer than `k` members.
    *
    * NULL quasi values form their own group (null-safe equality on the
    * join, matching `groupBy`'s NULL bucketing), so an all-NULL
    * combination is suppressed or kept by the same size rule as any
    * other. A kept NULL stays NULL (masking only rewrites small groups).
    *
    * Output: (`idCol`, `<q>_g` masked-string quasi columns, group_n,
    * kept) — BIGINT/VARCHAR/BOOLEAN only, hash-stable edges. */
  def kAnonymize(df: DataFrame, idCol: String, quasi: Seq[String],
                 k: Long): DataFrame = {
    require(quasi.nonEmpty, "k-anonymity needs at least one quasi-identifier")
    require(k >= 1, s"k must be >= 1, got $k")
    val base = df.select((idCol +: quasi).map(col): _*).alias("b")
    val groups = df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("group_n")).alias("g")
    val cond = quasi.map(q => col(s"b.$q") <=> col(s"g.$q")).reduce(_ && _)
    val kept = col("group_n") >= k
    val masked = quasi.map(q =>
      when(kept, col(s"b.$q").cast("string")).otherwise(lit("*")).as(s"${q}_g"))
    base.join(groups, cond)
      .select((col(s"b.$idCol").as(idCol) +: masked) ++
        Seq(col("group_n"), kept.as("kept")): _*)
  }

  /** l-diversity audit — k-anonymity's companion check (Machanavajjhala
    * et al.): a quasi-group is safe against attribute disclosure only
    * when it contains at least `l` DISTINCT values of the sensitive
    * attribute (a size-50 group that is 100% one source still leaks).
    * Reports every quasi-group with its size, its distinct sensitive
    * count, and the `diverse` verdict; release tooling joins the
    * non-diverse groups back as a suppression list.
    *
    * NULL sensitive values don't count toward diversity (countDistinct
    * skips NULLs, matching SQL COUNT(DISTINCT)); NULL quasi values group
    * together like `groupBy` buckets them.
    *
    * Scale posture: one keyed aggregation — map-side partial
    * count-distinct sketchless exact form shuffles (quasi, sensitive)
    * once; output is one row per distinct quasi combination. */
  def lDiversity(df: DataFrame, quasi: Seq[String], sensitive: String,
                 l: Long): DataFrame = {
    require(quasi.nonEmpty, "l-diversity needs at least one quasi-identifier")
    require(l >= 1, s"l must be >= 1, got $l")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("group_n"),
        countDistinct(col(sensitive)).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
  }

  /** Quasi-identifier group counts of a reference corpus — the
    * persistable side of the incremental release gate (write with
    * [[graft.io.Sinks]], reload across sessions like the dedup family's
    * corpus indexes). One keyed aggregation; one row per distinct quasi
    * combination. */
  def buildQuasiIndex(df: DataFrame, quasi: Seq[String]): DataFrame = {
    require(quasi.nonEmpty, "quasi index needs at least one column")
    df.groupBy(quasi.map(col): _*).agg(count(lit(1)).as("corpus_n"))
  }

  /** Incremental k-anonymity: gate a NEW batch against corpus-level
    * group sizes without rescanning the corpus — group size = corpus
    * index count (absent combination = 0) + the batch's own count, so
    * the verdict is EXACTLY [[kAnonymize]] over corpus ∪ batch
    * restricted to the batch rows (spec-pinned). The corpus index is
    * [[buildQuasiIndex]] output, typically persisted once and reused
    * across arriving batches — the same contract as the dedup family's
    * persisted corpus indexes.
    *
    * Scale posture: one keyed count over the BATCH, one null-safe join
    * against the key-cardinality index, one join back to batch rows —
    * the corpus is never rescanned, and nothing shuffles row-level
    * corpus data. */
  def kAnonymizeAgainst(batch: DataFrame, index: DataFrame, idCol: String,
                        quasi: Seq[String], k: Long): DataFrame = {
    require(quasi.nonEmpty, "k-anonymity needs at least one quasi-identifier")
    require(k >= 1, s"k must be >= 1, got $k")
    val bCounts = batch.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("batch_n")).alias("bc")
    val ix = index.alias("ix")
    val ixCond = quasi.map(q => col(s"bc.$q") <=> col(s"ix.$q")).reduce(_ && _)
    val groups = bCounts.join(ix, ixCond, "left")
      .select(quasi.map(q => col(s"bc.$q")) :+
        (coalesce(col("ix.corpus_n"), lit(0L)) + col("batch_n"))
          .as("group_n"): _*)
      .alias("g")
    val b = batch.select((idCol +: quasi).map(col): _*).alias("b")
    val cond = quasi.map(q => col(s"b.$q") <=> col(s"g.$q")).reduce(_ && _)
    val kept = col("group_n") >= k
    val masked = quasi.map(q =>
      when(kept, col(s"b.$q").cast("string")).otherwise(lit("*")).as(s"${q}_g"))
    b.join(groups, cond)
      .select((col(s"b.$idCol").as(idCol) +: masked) ++
        Seq(col("group_n"), kept.as("kept")): _*)
  }

  /** t-closeness audit — the distributional member of the release-gate
    * triple (Li, Ninghui et al.): a quasi-group passes only when its
    * sensitive-attribute distribution stays within distance `t` of the
    * GLOBAL distribution (an l-diverse group whose source mix is wildly
    * skewed vs the corpus still leaks membership information). For the
    * categorical sensitive attributes this engine audits, the distance
    * is total variation: TVD_g = ½ Σ_s |c_gs/n_g − c_s/N|.
    *
    * Engine-exact like [[graft.ops.Drift.driftSummary]]'s TVD: the
    * statistic is computed as an integer rational and emitted in basis
    * points, `tvd_bp = (Σ_s |c_gs·N − c_s·n_g|) · 10⁴ div (2·n_g·N)`,
    * all products in DECIMAL(38,0) — no doubles anywhere (HUGEINT `//`
    * replays it exactly). Categories ABSENT from a group still
    * contribute |0·N − c_s·n_g| = c_s·n_g; rather than generating the
    * group×category cross product, the identity
    * Σ_all = Σ_present (|c_gs·N − c_s·n_g| − c_s·n_g) + n_g·N
    * folds every absent category into one closed-form term, so the join
    * frame stays at the OBSERVED (quasi, sensitive) cells.
    *
    * NULL sensitive values form their own category and NULL quasi
    * values their own group (null-safe joins mirror `groupBy`).
    *
    * Scale posture: one keyed aggregation over the input builds the
    * cell frame; group totals, category totals, and the corpus total
    * are re-aggregations of that cell frame (identical exchange subtree
    * → Spark's ReuseExchange scans the input once), joined back on
    * key-cardinality frames plus one 1-row broadcast — no window over
    * row-level data, no driver-side state.
    *
    * Output: (quasi…, group_n, tvd_bp, close) with close = tvd_bp ≤
    * `tBp` — BIGINT/BOOLEAN edges only. */
  def tCloseness(df: DataFrame, quasi: Seq[String], sensitive: String,
                 tBp: Long): DataFrame = {
    require(quasi.nonEmpty, "t-closeness needs at least one quasi-identifier")
    require(tBp >= 0 && tBp <= 10000, s"tBp is basis points in [0,10000], got $tBp")
    def dec(c: Column): Column = c.cast(DecimalType(38, 0))
    val cell = df.groupBy((quasi :+ sensitive).map(col): _*)
      .agg(count(lit(1)).as("c_gs"))
    val gTot = cell.groupBy(quasi.map(col): _*)
      .agg(sum("c_gs").as("group_n")).alias("g")
    val sTot = cell.groupBy(col(sensitive))
      .agg(sum("c_gs").as("c_s")).alias("s")
    val nTot = cell.agg(sum("c_gs").as("n_total"))
    val c = cell.alias("c")
    val qCond = quasi.map(q => col(s"c.$q") <=> col(s"g.$q")).reduce(_ && _)
    val joined = c
      .join(gTot, qCond)
      .join(sTot, col(s"c.$sensitive") <=> col(s"s.$sensitive"))
      .crossJoin(broadcast(nTot))
    // signed per-cell adjustment vs the all-absent baseline n_g·N; the
    // long×long products ride the codegen'd Mul128 primitive (identical
    // integers, no serialized-BigDecimal multiply per cell)
    val m128 = graft.functions.Mul128.mul128 _
    val term = abs(m128(col("c_gs"), col("n_total")) -
        m128(col("c_s"), col("group_n"))) -
      m128(col("c_s"), col("group_n"))
    joined.groupBy(quasi.map(q => col(s"g.$q").as(q)): _*)
      .agg(max("group_n").as("group_n"), max("n_total").as("n_total"),
        sum(term).as("__adj"))
      .withColumn("__num",
        (col("__adj") + m128(col("group_n"), col("n_total"))) *
          dec(lit(10000L)))
      .withColumn("__den",
        dec(lit(2L)) * m128(col("group_n"), col("n_total")))
      // numerator ≥ 0 (it is Σ of absolute gaps), so trunc == floor on
      // both engines; IntegralDivide on decimals yields BIGINT
      .withColumn("tvd_bp", expr("__num div __den"))
      .select(quasi.map(col) ++ Seq(col("group_n"), col("tvd_bp"),
        (col("tvd_bp") <= tBp).as("close")): _*)
  }
}
