package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Entities
import graft.ops.{Associations, Classifier, Dedup, Drift, Graph, TextAnalysis}
import graft.streaming.EventStreams

/** Model-flavoured corpus analytics (round 8): trained Naive-Bayes
  * document classification (the learned quality/language gate of LLM
  * data recipes), TextRank keyword extraction (integer PageRank over
  * the word co-occurrence graph), and quantized-KL source drift. All
  * three are engine-exact by construction — integer-bits logs and
  * scaled-integer ranks — so every query here hash-matches a DuckDB
  * replay (see each operator's scaladoc for the quantization and
  * overflow contracts).
  */
object ModelQueries {

  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, dir: String) = Entities.read(s, dir, "documents")
  private def events(s: SparkSession, dir: String) =
    EventStreams.normalizeTs(Entities.read(s, dir, "events"))

  /** Distinct symmetrized word-adjacency edges over lowercased
    * whitespace tokens, self-loops excluded — the TextRank graph. Both
    * orientations come from ONE evaluation of the bigram plan (the
    * explode-of-2-struct-array idiom, [[graft.ops.Dedup.nearDupClusters]]). */
  private def wordEdges(d: DataFrame): DataFrame = {
    val toks = d.select(TextAnalysis.tokens(lower(col("text"))).as("tk"))
    val bi = toks.select(explode(
        when(size(col("tk")) >= 2,
          transform(sequence(lit(0), size(col("tk")) - 2),
            i => struct(element_at(col("tk"), i + 1).as("w1"),
              element_at(col("tk"), i + 2).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("e"))
      .select(col("e.w1").as("w1"), col("e.w2").as("w2"))
      .filter(col("w1") =!= col("w2"))
    bi.select(explode(array(
        struct(col("w1").as("src"), col("w2").as("dst")),
        struct(col("w2").as("src"), col("w1").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
  }

  val queries: Map[String, Q] = Map(
    // held-out NB language prediction over documents: train on
    // doc_id%5!=0, score the rest; argmax with smallest-class tie-break
    "q_nb_predict" -> ((s, dir) =>
      Classifier.nbPredict(docs(s, dir), "doc_id", "text", "lang")
        ),

    // the classifier gate's shipped quality report
    "q_nb_confusion" -> ((s, dir) =>
      Classifier.nbConfusion(docs(s, dir), "doc_id", "text", "lang")
        ),

    // TextRank: 4 integer-PageRank rounds over the word graph, top 50
    // keywords by (rank, token) total order
    "q_text_textrank" -> ((s, dir) =>
      Graph.pageRank(wordEdges(docs(s, dir)), "src", "dst", iters = 4)
        .orderBy(desc("rank_scaled"), asc("node"))
        .limit(50)
        .select(col("node").as("token"), col("rank_scaled"))),

    // TextRank proper: co-occurrence-WEIGHTED PageRank over the word
    // graph (edge weight = adjacency count), top 50
    "q_text_textrank_weighted" -> ((s, dir) => {
      val toks = docs(s, dir)
        .select(TextAnalysis.tokens(lower(col("text"))).as("tk"))
      val bi = toks.select(explode(
          when(size(col("tk")) >= 2,
            transform(sequence(lit(0), size(col("tk")) - 2),
              i => struct(element_at(col("tk"), i + 1).as("w1"),
                element_at(col("tk"), i + 2).as("w2"))))
            .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("e"))
        .select(col("e.w1").as("w1"), col("e.w2").as("w2"))
        .filter(col("w1") =!= col("w2"))
      val edges = bi.select(explode(array(
          struct(col("w1").as("src"), col("w2").as("dst")),
          struct(col("w2").as("src"), col("w1").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      Graph.pageRankWeighted(edges, "src", "dst", "w", iters = 4)
        .orderBy(desc("rank_scaled"), asc("node"))
        .limit(50)
        .select(col("node").as("token"), col("rank_scaled"))
    }),

    // per-source token-distribution drift vs the corpus mix
    "q_drift_kl_source" -> ((s, dir) =>
      Drift.tokenKlBySlice(docs(s, dir), "source", "text")
        ),

    // batch-vs-reference drift tripwire (the streaming driftMonitor's
    // exact batch plan): held-out split scored against the train split
    "q_drift_kl_batch" -> ((s, dir) => {
      val d = docs(s, dir)
      Drift.tokenKlAgainst(
        Drift.tokenDistribution(d.filter(pmod(col("doc_id"), lit(5)) =!= 0), "text"),
        d.filter(pmod(col("doc_id"), lit(5)) === 0), "text")
    }),

    // 5-fold cross-validated NB accuracy, ONE pass via count subtraction
    "q_nb_cv" -> ((s, dir) =>
      Classifier.nbCrossValidate(docs(s, dir), "doc_id", "text", "lang", folds = 5)
        ),

    // active-learning signal: per-doc top1−top2 score margin
    "q_nb_margin" -> ((s, dir) =>
      Classifier.nbMargins(docs(s, dir), "doc_id", "text", "lang")
        ),

    // feature selection: per-class top-20 tokens by quantized PMI
    "q_text_class_terms" -> ((s, dir) =>
      Classifier.classIndicativeTerms(docs(s, dir), "text", "lang",
          k = 20, minCount = 5L)
        ),

    // reliability report: held-out accuracy per margin percent-rank band
    "q_nb_calibration" -> ((s, dir) =>
      Classifier.nbCalibration(docs(s, dir), "doc_id", "text", "lang",
          splitMod = 5, buckets = 10)
        ),

    // perplexity-style scoring vs a FOREIGN reference corpus (train on
    // the %5!=0 split, score the held-out docs; unseen-bigram penalty)
    "q_text_lm_foreign" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.ops.LanguageModel.bigramBitScoresAgainst(
          d.filter(pmod(col("doc_id"), lit(5)) =!= 0),
          d.filter(pmod(col("doc_id"), lit(5)) === 0),
          "doc_id", "text")

    }),

    // deterministic percentile-bootstrap CI for the corpus mean length
    "q_stats_bootstrap" -> ((s, dir) =>
      graft.ops.Stats.bootstrapMeanCI(docs(s, dir), "doc_id", "n_chars",
        b = 200, alpha = 0.05)),

    // experiment analysis: per-event-type Welch two-sample comparison
    // of value across the user_id-parity variants (exact moments)
    "q_events_ab_welch" -> ((s, dir) =>
      graft.ops.Stats.welchTwoSample(
          events(s, dir).withColumn("variant", pmod(col("user_id"), lit(2))),
          Seq("event_type"), "variant", "value")
        ),

    // basket mining: unordered within-session co-occurrence with lift
    "q_events_cooccurrence" -> ((s, dir) =>
      Associations.sessionCooccurrence(events(s, dir), "user_id", "ts",
          "event_id", "event_type")
        ),

    // semi-supervised labeling: spread the known (train-split) langs
    // through the 0.5-jaccard near-dup graph to the held-out docs
    "q_label_propagation" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.jaccardPairs(d, "doc_id", "text", 3, LpThreshold)
      val edges = pairs.select(explode(array(
          struct(col("doc_i").as("src"), col("doc_j").as("dst")),
          struct(col("doc_j").as("src"), col("doc_i").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      val seeds = d.filter(pmod(col("doc_id"), lit(5)) =!= 0)
        .select(col("doc_id"), col("lang"))
      val labels = Graph.labelPropagate(edges, "src", "dst",
          seeds, "doc_id", "lang", iters = 3)
        .select(col("node").cast("long").as("doc_id"), col("label"))
      d.select(col("doc_id"))
        .join(labels, Seq("doc_id"), "left")

    }),

    // related-document expansion: personalized PageRank from a seed
    // subset through the 0.5-jaccard near-dup graph
    "q_dedup_related" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.jaccardPairs(d, "doc_id", "text", 3, LpThreshold)
      val edges = pairs.select(explode(array(
          struct(col("doc_i").as("src"), col("doc_j").as("dst")),
          struct(col("doc_j").as("src"), col("doc_i").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      val seeds = d.filter(pmod(col("doc_id"), lit(7)) === 0).select("doc_id")
      Graph.pageRankPersonalized(edges, "src", "dst", seeds, "doc_id", iters = 3)
        .select(col("node").cast("long").as("doc_id"), col("rank_scaled"))
        .filter(col("rank_scaled") > 0)
        .orderBy(desc("rank_scaled"), asc("doc_id"))
        .limit(100)
    }),

    // "which duplicate do we keep": canonical representative per
    // near-dup cluster = the member with the highest PageRank centrality
    // in the pair graph (ties to the smallest doc_id; singletons are
    // their own canonical). Composes the jaccard pair family with
    // Graph.pageRank — the dedup SURVIVOR policy beyond min-id.
    "q_dedup_canonical" -> ((s, dir) => {
      val d = docs(s, dir)
      // the pair sweep feeds BOTH the CC clustering and the centrality
      // edges — persist it once (query-layer window, bench-released) so
      // the whole jaccard index/verify pipeline runs a single time
      val pairs = ResultSort.window.add(
        Dedup.jaccardPairs(d, "doc_id", "text", 3,
          ExtensionQueries.JaccardThreshold))
      val clusters = Dedup.nearDupClusters(d, pairs, "doc_id")
      // both orientations of the (already doc_i < doc_j unique) pairs —
      // the explode-of-2-struct-array single-evaluation idiom
      val edges = pairs.select(explode(array(
          struct(col("doc_i").as("src"), col("doc_j").as("dst")),
          struct(col("doc_j").as("src"), col("doc_i").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      val pr = Graph.pageRank(edges, "src", "dst", iters = 3)
        .select(col("node").cast("long").as("doc_id"),
          col("rank_scaled"))
      val m = clusters.join(pr, Seq("doc_id"), "left")
        .select(col("doc_id"), col("cluster_id"),
          coalesce(col("rank_scaled"), lit(-1L)).as("rk"))
      val canonical = m.groupBy("cluster_id")
        .agg(max(struct(col("rk"), (-col("doc_id")).as("neg"))).as("best"))
        .select(col("cluster_id"), (-col("best.neg")).as("canonical_id"))
      m.join(canonical, "cluster_id")
        .select(col("doc_id"), col("cluster_id"), col("canonical_id"))

    }),
  )

  /** Jaccard threshold for the label-propagation near-dup graph — looser
    * than the dedup family's 0.8 so the graph actually connects held-out
    * docs to labeled neighbors at fixture scale. */
  private val LpThreshold = 0.5

  /** Unrolled label-propagation CTE chain `l0..l{iters}` over edge CTE
    * `e` and seed CTE `seeds` (node, seed) — per round: labeled-neighbor
    * majority with (count DESC, label ASC) tie-break, seeds clamped,
    * previous label kept when no labeled neighbor. */
  private def labelPropCtes(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""m$k AS (SELECT dst, nl AS maj FROM (
         |    SELECT e.dst, l.label AS nl, COUNT(*) AS cnt,
         |      ROW_NUMBER() OVER (PARTITION BY e.dst
         |        ORDER BY COUNT(*) DESC, l.label ASC) AS rn
         |    FROM e JOIN l${k - 1} l ON l.node = e.src
         |    WHERE l.label IS NOT NULL GROUP BY e.dst, l.label) WHERE rn = 1),
         |l$k AS (SELECT n.node, COALESCE(s.seed, m.maj, p.label) AS label
         |  FROM nodes n LEFT JOIN seeds s ON s.node = n.node
         |  LEFT JOIN m$k m ON m.dst = n.node
         |  LEFT JOIN l${k - 1} p ON p.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""nodes AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e
       |   UNION ALL SELECT node FROM seeds)),
       |l0 AS (SELECT n.node, s.seed AS label FROM nodes n
       |       LEFT JOIN seeds s ON s.node = n.node),
       |$rounds""".stripMargin
  }

  /** Unrolled WEIGHTED-PageRank CTE chain over edge CTE `e(src, dst, w)`
    * — proportional split `(r·w) // Σw`; mirrors
    * [[graft.ops.Graph.pageRankWeighted]]. */
  private def pageRankCtesWeighted(iters: Int, scale: Long, dampNum: Int,
                                   dampDen: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""c$k AS (SELECT dst, SUM((r * w) // wsum) AS cs
         |  FROM e JOIN r${k - 1} ON r${k - 1}.node = e.src JOIN deg USING (src)
         |  GROUP BY 1),
         |r$k AS (SELECT nodes.node,
         |    ($scale * ${dampDen - dampNum}) // ($dampDen * n)
         |      + ($dampNum * COALESCE(cs, 0)) // $dampDen AS r
         |  FROM nodes CROSS JOIN cnt LEFT JOIN c$k ON c$k.dst = nodes.node)"""
        .stripMargin
    }.mkString(",\n")
    s"""nodes AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |cnt AS (SELECT COUNT(*) AS n FROM nodes),
       |deg AS (SELECT src, SUM(w) AS wsum FROM e GROUP BY 1),
       |r0 AS (SELECT node, $scale // n AS r FROM nodes CROSS JOIN cnt),
       |$rounds""".stripMargin
  }

  /** Unrolled PERSONALIZED-PageRank CTE chain over edge CTE `e` and
    * seed CTE `seeds(node)` — teleport and r0 land on seeds only. */
  private def pprCtes(iters: Int, scale: Long, dampNum: Int,
                      dampDen: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""c$k AS (SELECT dst, SUM(r // deg) AS cs
         |  FROM e JOIN r${k - 1} ON r${k - 1}.node = e.src JOIN deg USING (src)
         |  GROUP BY 1),
         |r$k AS (SELECT b.node,
         |    b.base + ($dampNum * COALESCE(cs, 0)) // $dampDen AS r
         |  FROM b LEFT JOIN c$k ON c$k.dst = b.node)""".stripMargin
    }.mkString(",\n")
    s"""sd AS (SELECT DISTINCT node FROM seeds),
       |nodes AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e
       |   UNION ALL SELECT node FROM sd)),
       |ns AS (SELECT COUNT(*) AS ns FROM sd),
       |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
       |b AS (SELECT n.node,
       |    CASE WHEN s.node IS NOT NULL
       |         THEN ($scale * ${dampDen - dampNum}) // ($dampDen * ns)
       |         ELSE 0 END AS base,
       |    CASE WHEN s.node IS NOT NULL THEN $scale // ns ELSE 0 END AS r0
       |  FROM nodes n LEFT JOIN sd s ON s.node = n.node CROSS JOIN ns),
       |r0 AS (SELECT node, r0 AS r FROM b),
       |$rounds""".stripMargin
  }

  /** Unrolled integer-PageRank CTE chain `r0..r{iters}` over edge CTE
    * `e` (with `nodes`/`cnt`/`deg` alongside) — DuckDB `//` replays
    * Spark's nonnegative `div` exactly. */
  private def pageRankCtes(iters: Int, scale: Long, dampNum: Int,
                           dampDen: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""c$k AS (SELECT dst, SUM(r // deg) AS cs
         |  FROM e JOIN r${k - 1} ON r${k - 1}.node = e.src JOIN deg USING (src)
         |  GROUP BY 1),
         |r$k AS (SELECT nodes.node,
         |    ($scale * ${dampDen - dampNum}) // ($dampDen * n)
         |      + ($dampNum * COALESCE(cs, 0)) // $dampDen AS r
         |  FROM nodes CROSS JOIN cnt LEFT JOIN c$k ON c$k.dst = nodes.node)"""
        .stripMargin
    }.mkString(",\n")
    // UNION ALL + DISTINCT, NOT a bare UNION: under a WITH RECURSIVE
    // header (the canonical-rep oracle) DuckDB gives every UNION CTE
    // recursive-union semantics and the arms stop deduplicating
    s"""nodes AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |cnt AS (SELECT COUNT(*) AS n FROM nodes),
       |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
       |r0 AS (SELECT node, $scale // n AS r FROM nodes CROSS JOIN cnt),
       |$rounds""".stripMargin
  }

  /** Shared NB training/scoring CTE chain ending in `rk` (per-test-doc
    * class ranking) — both NB oracles extend it. */
  private val nbCtes: String =
    """base AS (SELECT doc_id, lang,
      |    [t FOR t IN string_split(lower(text), ' ') IF t <> ''] AS tk,
      |    (doc_id % 5 = 0) AS is_test FROM documents),
      |ttok AS (SELECT lang, unnest(tk) AS tok FROM base WHERE NOT is_test),
      |ctc AS (SELECT lang AS cls, tok, COUNT(*) AS c_tc FROM ttok GROUP BY 1, 2),
      |nc AS (SELECT lang AS cls, COUNT(*) AS n_c FROM ttok GROUP BY 1),
      |voc AS (SELECT COUNT(DISTINCT tok) AS v FROM ttok),
      |dc AS (SELECT lang AS cls, COUNT(*) AS d_c FROM base WHERE NOT is_test GROUP BY 1),
      |dt AS (SELECT COUNT(*) AS d_train FROM base WHERE NOT is_test),
      |classes AS (SELECT cls,
      |    length(bin((COALESCE(n_c, 0) + v) * (COALESCE(n_c, 0) + v))) - 1 AS den_bits,
      |    (length(bin(d_c * d_c)) - 1) - (length(bin(d_train * d_train)) - 1) AS prior_bits
      |  FROM dc LEFT JOIN nc USING (cls) CROSS JOIN voc CROSS JOIN dt),
      |stok AS (SELECT doc_id, unnest(tk) AS tok FROM base WHERE is_test),
      |present AS (SELECT doc_id, cls,
      |    SUM(length(bin((c_tc + 1) * (c_tc + 1))) - 1) AS pos_bits
      |  FROM stok JOIN ctc USING (tok) GROUP BY 1, 2),
      |ntok AS (SELECT doc_id, COUNT(*) AS n_tok FROM stok GROUP BY 1),
      |scored AS (SELECT b.doc_id, b.lang AS label_true, c.cls,
      |    c.prior_bits + COALESCE(p.pos_bits, 0) - COALESCE(t.n_tok, 0) * c.den_bits AS score
      |  FROM base b CROSS JOIN classes c
      |  LEFT JOIN ntok t ON t.doc_id = b.doc_id
      |  LEFT JOIN present p ON p.doc_id = b.doc_id AND p.cls = c.cls
      |  WHERE b.is_test),
      |rk AS (SELECT doc_id, label_true, cls, score,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, cls ASC) AS rn
      |  FROM scored)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_nb_predict" ->
      s"""WITH $nbCtes
         |SELECT doc_id, label_true, cls AS predicted,
         |  CAST(score AS BIGINT) AS score,
         |  CAST(CASE WHEN cls = label_true THEN 1 ELSE 0 END AS BIGINT) AS hit
         |FROM rk WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q_nb_confusion" ->
      s"""WITH $nbCtes
         |SELECT label_true, cls AS predicted, COUNT(*) AS n
         |FROM rk WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_nb_margin" ->
      s"""WITH $nbCtes
         |SELECT r1.doc_id, r1.label_true, r1.cls AS predicted,
         |  CAST(r1.score AS BIGINT) AS score,
         |  CAST(r1.score - r2.score AS BIGINT) AS margin
         |FROM rk r1 LEFT JOIN rk r2 ON r2.doc_id = r1.doc_id AND r2.rn = 2
         |WHERE r1.rn = 1 ORDER BY r1.doc_id""".stripMargin,

    "q_text_class_terms" ->
      """WITH tok AS (SELECT lang AS cls,
        |    unnest([t FOR t IN string_split(lower(text), ' ') IF t <> '']) AS tok
        |  FROM documents),
        |ctc AS (SELECT cls, tok, COUNT(*) AS c_tc FROM tok GROUP BY 1, 2),
        |nc AS (SELECT cls, CAST(SUM(c_tc) AS BIGINT) AS n_c FROM ctc GROUP BY 1),
        |ct AS (SELECT tok, CAST(SUM(c_tc) AS BIGINT) AS c_t FROM ctc GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_c) AS BIGINT) AS n_total FROM nc),
        |sc AS (SELECT c.cls, c.tok, c.c_tc,
        |    CAST((length(bin(c.c_tc * t.n_total)) - 1)
        |       - (length(bin(n.n_c * ct.c_t)) - 1) AS BIGINT) AS pmi_bits
        |  FROM ctc c JOIN ct ON ct.tok = c.tok JOIN nc n ON n.cls = c.cls
        |  CROSS JOIN tot t
        |  WHERE c.c_tc >= 5),
        |rnk AS (SELECT cls, tok, c_tc, pmi_bits,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY cls
        |      ORDER BY pmi_bits DESC, tok ASC) AS INT) AS rk FROM sc)
        |SELECT cls, rk, tok, c_tc, pmi_bits FROM rnk WHERE rk <= 20
        |ORDER BY cls, rk""".stripMargin,

    "q_nb_calibration" -> {
      val bands = (1 to 9).map(i =>
        s"WHEN pr <= 0.${i} THEN 'd0$i'").mkString(" ")
      s"""WITH $nbCtes,
         |mg AS (SELECT r1.doc_id, r1.label_true, r1.cls AS predicted,
         |    CAST(r1.score - r2.score AS BIGINT) AS margin
         |  FROM rk r1 LEFT JOIN rk r2 ON r2.doc_id = r1.doc_id AND r2.rn = 2
         |  WHERE r1.rn = 1),
         |pr AS (SELECT *, PERCENT_RANK() OVER (ORDER BY margin ASC) AS pr FROM mg),
         |bd AS (SELECT *, CASE $bands ELSE 'd10' END AS bucket FROM pr)
         |SELECT bucket, COUNT(*) AS n,
         |  MIN(margin) AS min_margin, MAX(margin) AS max_margin,
         |  CAST(SUM(CASE WHEN predicted = label_true THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         |  CAST(SUM(CASE WHEN predicted = label_true THEN 1 ELSE 0 END) AS DOUBLE)
         |    / COUNT(*) AS accuracy
         |FROM bd GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q_text_lm_foreign" ->
      """WITH tr AS (SELECT doc_id,
        |    [t FOR t IN string_split(text, ' ') IF t <> ''] AS tk
        |  FROM documents WHERE doc_id % 5 <> 0),
        |te AS (SELECT doc_id,
        |    [t FOR t IN string_split(text, ' ') IF t <> ''] AS tk
        |  FROM documents WHERE doc_id % 5 = 0),
        |bi AS (SELECT doc_id, tk[i] AS w1, tk[i] || ' ' || tk[i+1] AS bg
        |       FROM (SELECT doc_id, tk,
        |             unnest(generate_series(1, len(tk)-1)) AS i FROM te)),
        |uni AS (SELECT tok, COUNT(*) AS cu
        |        FROM (SELECT unnest(tk) AS tok FROM tr) GROUP BY 1),
        |bc AS (SELECT bg, COUNT(*) AS cb FROM
        |        (SELECT tk[i] || ' ' || tk[i+1] AS bg
        |         FROM (SELECT tk, unnest(generate_series(1, len(tk)-1)) AS i
        |               FROM tr)) GROUP BY 1),
        |sc AS (SELECT doc_id, COUNT(*) AS n_bigrams,
        |          CAST(SUM((length(bin(COALESCE(cb, 1))) - 1)
        |                 - (length(bin(COALESCE(cu, 1))) - 1)) AS BIGINT) AS ll_bits,
        |          CAST(SUM(CASE WHEN cb IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS unseen_bigrams,
        |          CAST(SUM(CASE WHEN cu IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_heads
        |       FROM bi LEFT JOIN uni ON bi.w1 = uni.tok
        |               LEFT JOIN bc USING (bg) GROUP BY 1)
        |SELECT d.doc_id, COALESCE(n_bigrams, 0) AS n_bigrams,
        |       COALESCE(ll_bits, 0) AS ll_bits,
        |       COALESCE(unseen_bigrams, 0) AS unseen_bigrams,
        |       COALESCE(oov_heads, 0) AS oov_heads
        |FROM documents d LEFT JOIN sc USING (doc_id)
        |WHERE d.doc_id % 5 = 0 ORDER BY d.doc_id""".stripMargin,

    "q_stats_bootstrap" -> {
      val chain = graft.ops.Stats.PoissonCdf.zipWithIndex
        .map { case (c, k) => s"WHEN u < $c THEN $k" }.mkString(" ")
      s"""WITH base AS (SELECT doc_id, CAST(round(n_chars * 100) AS HUGEINT) AS v
         |  FROM documents WHERE n_chars IS NOT NULL),
         |rep AS (SELECT doc_id, v, unnest(generate_series(1, 200)) AS r FROM base),
         |um AS (SELECT v, r,
         |    (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
         |       || CAST(r AS VARCHAR) || ':42'), 1, 13)) AS BIGINT) + 0.5)
         |      / 4503599627370496.0 AS u
         |  FROM rep),
         |mm AS (SELECT r, v, CASE $chain ELSE 9 END AS m FROM um),
         |mr AS (SELECT r, SUM(v * m) AS sv, CAST(SUM(m) AS BIGINT) AS sm
         |       FROM mm GROUP BY 1),
         |means AS (SELECT CASE WHEN sm > 0
         |    THEN (CAST(sv AS DOUBLE) / CAST(sm AS DOUBLE)) / 100 END AS mean_r
         |  FROM mr),
         |pt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    (CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) / 100 AS mean
         |  FROM base),
         |s AS (SELECT list_sort(list(mean_r)) AS arr FROM means)
         |SELECT pt.n_rows, 200 AS b, pt.mean,
         |  arr[5] AS ci_lo, arr[196] AS ci_hi
         |FROM s CROSS JOIN pt""".stripMargin
    },

    "q_events_ab_welch" -> {
      val meanA = "(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)) / 100"
      val meanB = "(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)) / 100"
      val varA =
        "(CAST(na * qa - sa * sa AS DOUBLE) / CAST(na * (na - 1) AS DOUBLE)) / 10000"
      val varB =
        "(CAST(nb * qb - sb * sb AS DOUBLE) / CAST(nb * (nb - 1) AS DOUBLE)) / 10000"
      val se2 = s"$varA / CAST(na AS DOUBLE) + $varB / CAST(nb AS DOUBLE)"
      s"""WITH b AS (SELECT event_type, user_id % 2 AS variant,
         |             CAST(round(value * 100) AS HUGEINT) AS v
         |           FROM events
         |           WHERE value IS NOT NULL AND isfinite(value)
         |             AND user_id IS NOT NULL),
         |m AS (SELECT event_type,
         |        CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS na,
         |        CAST(SUM(CASE WHEN variant <> 0 THEN 1 ELSE 0 END) AS HUGEINT) AS nb,
         |        SUM(CASE WHEN variant = 0 THEN v ELSE 0 END) AS sa,
         |        SUM(CASE WHEN variant <> 0 THEN v ELSE 0 END) AS sb,
         |        SUM(CASE WHEN variant = 0 THEN v * v ELSE 0 END) AS qa,
         |        SUM(CASE WHEN variant <> 0 THEN v * v ELSE 0 END) AS qb
         |      FROM b GROUP BY 1)
         |SELECT event_type,
         |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
         |  CASE WHEN na > 0 THEN $meanA END AS mean_a,
         |  CASE WHEN nb > 0 THEN $meanB END AS mean_b,
         |  CASE WHEN na > 1 THEN $varA END AS var_a,
         |  CASE WHEN nb > 1 THEN $varB END AS var_b,
         |  CASE WHEN na > 1 AND nb > 1 AND $se2 > 0.0
         |       THEN ($meanA - $meanB) / sqrt($se2) END AS t_stat
         |FROM m ORDER BY event_type""".stripMargin
    },

    "q_events_cooccurrence" ->
      """WITH o AS (SELECT user_id, event_id, ts, event_type,
        |             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |           FROM events),
        |m AS (SELECT user_id, event_id, ts, event_type,
        |        CASE WHEN prev_ts IS NULL
        |               OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |             THEN 1 ELSE 0 END AS new_s
        |      FROM o),
        |s AS (SELECT user_id, event_type,
        |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                         ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m),
        |basket AS (SELECT DISTINCT user_id, sid, event_type FROM s),
        |ns AS (SELECT COUNT(*) AS n_sessions FROM
        |        (SELECT DISTINCT user_id, sid FROM basket)),
        |itn AS (SELECT event_type AS item, COUNT(*) AS n_item FROM basket GROUP BY 1),
        |p AS (SELECT a.event_type AS item_a, b.event_type AS item_b,
        |        COUNT(*) AS n_ab
        |      FROM basket a JOIN basket b
        |        ON a.user_id = b.user_id AND a.sid = b.sid
        |       AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT p.item_a, p.item_b, p.n_ab,
        |  na.n_item AS n_a, nb.n_item AS n_b, ns.n_sessions,
        |  CAST(p.n_ab AS DOUBLE) / ns.n_sessions AS support,
        |  CAST(p.n_ab AS DOUBLE) / na.n_item AS conf_ab,
        |  CAST(p.n_ab AS DOUBLE) / nb.n_item AS conf_ba,
        |  CAST(p.n_ab * ns.n_sessions AS DOUBLE) / (na.n_item * nb.n_item) AS lift
        |FROM p JOIN itn na ON na.item = p.item_a
        |       JOIN itn nb ON nb.item = p.item_b
        |       CROSS JOIN ns
        |ORDER BY item_a, item_b""".stripMargin,

    "q_label_propagation" ->
      s"""WITH ${ExtensionQueries.jaccardCtes(LpThreshold)},
         |e AS (SELECT doc_i AS src, doc_j AS dst FROM jpairs
         |      UNION ALL SELECT doc_j, doc_i FROM jpairs),
         |seeds AS (SELECT doc_id AS node, lang AS seed FROM documents
         |          WHERE doc_id % 5 <> 0),
         |${labelPropCtes(iters = 3)}
         |SELECT d.doc_id, l.label
         |FROM documents d LEFT JOIN l3 l ON l.node = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "q_dedup_related" ->
      s"""WITH ${ExtensionQueries.jaccardCtes(LpThreshold)},
         |e AS (SELECT doc_i AS src, doc_j AS dst FROM jpairs
         |      UNION ALL SELECT doc_j, doc_i FROM jpairs),
         |seeds AS (SELECT doc_id AS node FROM documents WHERE doc_id % 7 = 0),
         |${pprCtes(iters = 3, scale = 1000000000000L, dampNum = 85, dampDen = 100)}
         |SELECT CAST(node AS BIGINT) AS doc_id, CAST(r AS BIGINT) AS rank_scaled
         |FROM r3 WHERE r > 0
         |ORDER BY rank_scaled DESC, doc_id LIMIT 100""".stripMargin,

    "q_dedup_canonical" ->
      s"""WITH RECURSIVE ${ExtensionQueries.jaccardCtes(ExtensionQueries.JaccardThreshold)},
         |e AS (SELECT doc_i AS src, doc_j AS dst FROM jpairs
         |      UNION ALL SELECT doc_j, doc_i FROM jpairs),
         |${pageRankCtes(iters = 3, scale = 1000000000000L, dampNum = 85, dampDen = 100)},
         |reach(node, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT reach.node, e2.dst FROM reach JOIN e e2 ON reach.r = e2.src),
         |clus AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node),
         |prr AS (SELECT CAST(node AS BIGINT) AS doc_id, CAST(r AS BIGINT) AS rank_scaled FROM r3),
         |m AS (SELECT c.doc_id, c.cluster_id, COALESCE(p.rank_scaled, -1) AS rk
         |      FROM clus c LEFT JOIN prr p ON p.doc_id = c.doc_id),
         |can AS (SELECT cluster_id, doc_id AS canonical_id FROM (
         |  SELECT cluster_id, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY cluster_id ORDER BY rk DESC, doc_id ASC) AS rn
         |  FROM m) WHERE rn = 1)
         |SELECT m.doc_id, m.cluster_id, can.canonical_id
         |FROM m JOIN can USING (cluster_id) ORDER BY m.doc_id""".stripMargin,

    "q_text_textrank" ->
      s"""WITH toks AS (SELECT doc_id,
         |    [t FOR t IN string_split(lower(text), ' ') IF t <> ''] AS tk
         |  FROM documents),
         |bi AS (SELECT tk[i] AS w1, tk[i+1] AS w2
         |  FROM (SELECT tk, unnest(generate_series(1, len(tk)-1)) AS i FROM toks)
         |  WHERE tk[i] <> tk[i+1]),
         |e AS (SELECT w1 AS src, w2 AS dst FROM bi UNION SELECT w2, w1 FROM bi),
         |${pageRankCtes(iters = 4, scale = 1000000000000L, dampNum = 85, dampDen = 100)}
         |SELECT node AS token, CAST(r AS BIGINT) AS rank_scaled FROM r4
         |ORDER BY rank_scaled DESC, token LIMIT 50""".stripMargin,

    "q_text_textrank_weighted" ->
      s"""WITH toks AS (SELECT doc_id,
         |    [t FOR t IN string_split(lower(text), ' ') IF t <> ''] AS tk
         |  FROM documents),
         |bi AS (SELECT tk[i] AS w1, tk[i+1] AS w2
         |  FROM (SELECT tk, unnest(generate_series(1, len(tk)-1)) AS i FROM toks)
         |  WHERE tk[i] <> tk[i+1]),
         |e AS (SELECT src, dst, COUNT(*) AS w FROM
         |  (SELECT w1 AS src, w2 AS dst FROM bi
         |   UNION ALL SELECT w2, w1 FROM bi) GROUP BY 1, 2),
         |${pageRankCtesWeighted(iters = 4, scale = 1000000000000L, dampNum = 85, dampDen = 100)}
         |SELECT node AS token, CAST(r AS BIGINT) AS rank_scaled FROM r4
         |ORDER BY rank_scaled DESC, token LIMIT 50""".stripMargin,

    "q_drift_kl_source" ->
      """WITH tok AS (SELECT source AS slice,
        |    unnest([t FOR t IN string_split(lower(text), ' ') IF t <> '']) AS tok
        |  FROM documents),
        |cst AS (SELECT slice, tok, COUNT(*) AS c_st FROM tok GROUP BY 1, 2),
        |ns AS (SELECT slice, CAST(SUM(c_st) AS BIGINT) AS n_s FROM cst GROUP BY 1),
        |ct AS (SELECT tok, COUNT(*) AS c_t FROM tok GROUP BY 1),
        |tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS n_total FROM ct),
        |terms AS (SELECT c.slice, s.n_s,
        |    c.c_st * ((length(bin(c.c_st * t.n_total)) - 1)
        |            - (length(bin(s.n_s * ct.c_t)) - 1)) AS term
        |  FROM cst c JOIN ct ON ct.tok = c.tok JOIN ns s ON s.slice = c.slice
        |  CROSS JOIN tot t),
        |agg AS (SELECT slice, MAX(n_s) AS n_tokens,
        |    CAST(SUM(term) AS BIGINT) AS kl_bits
        |  FROM terms GROUP BY 1)
        |SELECT slice, n_tokens, kl_bits,
        |  CAST(kl_bits AS DOUBLE) / n_tokens AS kl_per_token
        |FROM agg ORDER BY slice""".stripMargin,

    "q_drift_kl_batch" ->
      """WITH ref AS (SELECT tok, COUNT(*) AS c_ref FROM
        |    (SELECT unnest([t FOR t IN string_split(lower(text), ' ') IF t <> '']) AS tok
        |     FROM documents WHERE doc_id % 5 <> 0) GROUP BY 1),
        |bt AS (SELECT tok, COUNT(*) AS c_b FROM
        |    (SELECT unnest([t FOR t IN string_split(lower(text), ' ') IF t <> '']) AS tok
        |     FROM documents WHERE doc_id % 5 = 0) GROUP BY 1),
        |nb AS (SELECT CAST(COALESCE(SUM(c_b), 0) AS BIGINT) AS n_b FROM bt),
        |nr AS (SELECT CAST(SUM(c_ref) AS BIGINT) AS n_ref FROM ref),
        |terms AS (SELECT b.c_b, nb.n_b,
        |    b.c_b * ((length(bin(b.c_b * nr.n_ref)) - 1)
        |           - (length(bin(nb.n_b * COALESCE(r.c_ref, 1))) - 1)) AS term,
        |    CASE WHEN r.c_ref IS NULL THEN b.c_b ELSE 0 END AS unseen
        |  FROM bt b LEFT JOIN ref r USING (tok) CROSS JOIN nb CROSS JOIN nr),
        |agg AS (SELECT MAX(n_b) AS n_tokens, CAST(SUM(term) AS BIGINT) AS kl_bits,
        |    CAST(SUM(unseen) AS BIGINT) AS unseen_tokens FROM terms)
        |SELECT COALESCE(n_tokens, 0) AS n_tokens, COALESCE(kl_bits, 0) AS kl_bits,
        |  CASE WHEN n_tokens > 0 THEN CAST(kl_bits AS DOUBLE) / n_tokens END AS kl_per_token,
        |  COALESCE(unseen_tokens, 0) AS unseen_tokens,
        |  CASE WHEN n_tokens > 0 THEN CAST(unseen_tokens AS DOUBLE) / n_tokens END AS unseen_frac
        |FROM agg""".stripMargin,

    "q_nb_cv" ->
      """WITH base AS (SELECT doc_id, lang, doc_id % 5 AS fold,
        |    [t FOR t IN string_split(lower(text), ' ') IF t <> ''] AS tk FROM documents),
        |ltok AS (SELECT doc_id, lang, fold, unnest(tk) AS tok FROM base),
        |actc AS (SELECT lang AS cls, tok, COUNT(*) AS c_all FROM ltok GROUP BY 1, 2),
        |fctc AS (SELECT fold, lang AS cls, tok, COUNT(*) AS c_f FROM ltok GROUP BY 1, 2, 3),
        |anc AS (SELECT lang AS cls, COUNT(*) AS n_all FROM ltok GROUP BY 1),
        |fnc AS (SELECT fold, lang AS cls, COUNT(*) AS n_f FROM ltok GROUP BY 1, 2),
        |dca AS (SELECT lang AS cls, COUNT(*) AS dc_all FROM base GROUP BY 1),
        |dcf AS (SELECT fold, lang AS cls, COUNT(*) AS dc_f FROM base GROUP BY 1, 2),
        |dal AS (SELECT COUNT(*) AS d_all FROM base),
        |dfl AS (SELECT fold, COUNT(*) AS d_f FROM base GROUP BY 1),
        |tt AS (SELECT tok, COUNT(*) AS t_all FROM ltok GROUP BY 1),
        |va AS (SELECT COUNT(*) AS v_all FROM tt),
        |ex AS (SELECT fold, COUNT(*) AS excl
        |  FROM (SELECT fold, tok, COUNT(*) AS t_f FROM ltok GROUP BY 1, 2) f
        |  JOIN tt USING (tok) WHERE t_f = t_all GROUP BY 1),
        |grid AS (SELECT g.fold, c.cls,
        |    length(bin((c.n_all - COALESCE(fn.n_f, 0) + v.v_all - COALESCE(e.excl, 0))
        |             * (c.n_all - COALESCE(fn.n_f, 0) + v.v_all - COALESCE(e.excl, 0)))) - 1 AS den_bits,
        |    (length(bin((c.dc_all - COALESCE(dc.dc_f, 0))
        |              * (c.dc_all - COALESCE(dc.dc_f, 0)))) - 1)
        |      - (length(bin((d.d_all - df.d_f) * (d.d_all - df.d_f))) - 1) AS prior_bits
        |  FROM (SELECT DISTINCT fold FROM base) g
        |  CROSS JOIN (SELECT dd.cls, COALESCE(a.n_all, 0) AS n_all, dd.dc_all
        |              FROM dca dd LEFT JOIN anc a USING (cls)) c
        |  LEFT JOIN fnc fn ON fn.fold = g.fold AND fn.cls = c.cls
        |  LEFT JOIN dcf dc ON dc.fold = g.fold AND dc.cls = c.cls
        |  JOIN dfl df ON df.fold = g.fold
        |  LEFT JOIN ex e ON e.fold = g.fold
        |  CROSS JOIN va v CROSS JOIN dal d
        |  WHERE c.dc_all - COALESCE(dc.dc_f, 0) > 0),
        |pres AS (SELECT t.doc_id, t.fold, a.cls,
        |    SUM(length(bin((a.c_all - COALESCE(f.c_f, 0) + 1)
        |              * (a.c_all - COALESCE(f.c_f, 0) + 1))) - 1) AS pos_bits
        |  FROM ltok t JOIN actc a ON a.tok = t.tok
        |  LEFT JOIN fctc f ON f.fold = t.fold AND f.cls = a.cls AND f.tok = t.tok
        |  GROUP BY 1, 2, 3),
        |nt AS (SELECT doc_id, COUNT(*) AS n_tok FROM ltok GROUP BY 1),
        |sc AS (SELECT b.doc_id, b.lang, g.cls,
        |    g.prior_bits + COALESCE(p.pos_bits, 0) - COALESCE(n.n_tok, 0) * g.den_bits AS score,
        |    b.fold
        |  FROM base b JOIN grid g ON g.fold = b.fold
        |  LEFT JOIN nt n ON n.doc_id = b.doc_id
        |  LEFT JOIN pres p ON p.doc_id = b.doc_id AND p.fold = b.fold AND p.cls = g.cls),
        |pick AS (SELECT doc_id, lang, fold, cls,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, cls ASC) AS rn
        |  FROM sc)
        |SELECT fold, COUNT(*) AS n_test,
        |  CAST(SUM(CASE WHEN cls = lang THEN 1 ELSE 0 END) AS BIGINT) AS hits,
        |  CAST(SUM(CASE WHEN cls = lang THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS accuracy
        |FROM pick WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
