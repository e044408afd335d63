package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("fingerprint matches a hand-computed polynomial hash") {
    // "ab" -> ((0*31+97)%P)*31+98 % P = 97*31+98 = 3105
    val out = Seq("ab").toDF("text")
      .select(TextAnalysis.fingerprint($"text")).first().getLong(0)
    assert(out == 3105L)
  }

  test("minGramFingerprint: min over 8-char windows; short-text fallback") {
    val df = Seq(("long enough text here", "short")).toDF("a", "b")
    val long = df.select(TextAnalysis.minGramFingerprint($"a", 8)).first().getLong(0)
    val short = df.select(TextAnalysis.minGramFingerprint($"b", 8)).first().getLong(0)
    val shortFull = df.select(TextAnalysis.fingerprint($"b")).first().getLong(0)
    assert(short == shortFull, "below k chars falls back to whole-text hash")
    assert(long >= 0 && long < TextAnalysis.P)
    // identical prefixes share the minimizing window often; at minimum, a
    // document is its own near-dup:
    val same = Seq(("long enough text here", "long enough text here")).toDF("a", "b")
    val fa = same.select(TextAnalysis.minGramFingerprint($"a", 8)).first().getLong(0)
    val fb = same.select(TextAnalysis.minGramFingerprint($"b", 8)).first().getLong(0)
    assert(fa == fb)
  }

  test("native rolling min-gram equals the HOF specification on the corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val diff = docs.select(
      TextAnalysis.minGramFingerprint($"text", 8).as("native"),
      TextAnalysis.minGramFingerprintHof($"text", 8).as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(diff == 0, "rolling update must equal the windowed fold exactly")
  }

  test("langId picks the stopword-richest language, en-first ties") {
    val df = Seq(
      "the cat and the dog is in the house",
      "der hund und die katze ist nicht zu",
      "el perro y la casa es un lugar no",
      "zzz qqq www" // no stopwords anywhere -> all scores 0 -> 'en' by tie order
    ).toDF("text")
    val scores = TextAnalysis.langScores($"text")
    val out = df.select(TextAnalysis.langId(scores)).collect().map(_.getString(0))
    assert(out.toSeq == Seq("en", "de", "es", "en"))
  }

  test("token counts: whitespace vs BPE-ish regex") {
    val df = Seq("Hello, world! 42 tokens").toDF("text")
    val r = df.select(
      size(TextAnalysis.tokens($"text")).as("ws"),
      size(TextAnalysis.bpeishTokens($"text")).as("bpe")).first()
    assert(r.getInt(0) == 4)
    // Hello , world ! 42 tokens -> 6
    assert(r.getInt(1) == 6)
  }

  test("normalizeText lowercases, collapses whitespace, trims") {
    val out = Seq("  Hello   WORLD\t\n again  ").toDF("text")
      .select(TextAnalysis.normalizeText($"text")).first().getString(0)
    assert(out == "hello world again")
  }

  test("content flags detect urls, emails, digit runs") {
    val df = Seq(
      ("see https://example.com/x now", true, false, 0),
      ("mail me at a.b+c@test.org", false, true, 0),
      ("id 1234567 and 89", false, false, 1),
      ("plain text", false, false, 0)
    ).toDF("text", "url", "email", "runs")
    val flags = TextAnalysis.contentFlags($"text")
    val rows = df.select($"url", $"email", $"runs",
      flags(0)._2.as("u"), flags(1)._2.as("e"), flags(2)._2.as("r")).collect()
    rows.foreach { r =>
      assert(r.getBoolean(0) == r.getBoolean(3))
      assert(r.getBoolean(1) == r.getBoolean(4))
      assert(r.getInt(2) == r.getInt(5))
    }
  }

  test("quality ratios bounded and punctuation-sensitive") {
    val clean = "the quick brown fox jumps over the lazy dog and it runs on"
    val noisy = "!!! ??? ... ,,, ;;;"
    val df = Seq(clean, noisy).toDF("text")
    val rows = df.select(
      $"text",
      TextAnalysis.punctRatio($"text").as("p"),
      TextAnalysis.qualityScore($"text").as("q")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(rows(clean)._1 == 0.0)
    assert(rows(noisy)._1 > 0.5)
    assert(rows(clean)._2 > rows(noisy)._2)
  }

  test("vocabulary counts df and tf; docTopTerms ranks by tf then token") {
    val docs = Seq((1L, "a b a c"), (2L, "a b b"), (3L, "")).toDF("doc_id", "text")
    val vocab = TextAnalysis.vocabulary(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(vocab == Map("a" -> ((2L, 3L)), "b" -> ((2L, 3L)), "c" -> ((1L, 1L))))
    val top = TextAnalysis.docTopTerms(docs, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getString(1)).toMap
    assert(top == Map((1L, 1) -> "a", (1L, 2) -> "b", (2L, 1) -> "b", (2L, 2) -> "a"))
  }

  test("top-terms ordLongs knob admits tokens past the 256-byte default") {
    // a whitespace-free 300-byte run (URL/base64-shaped) crashes the
    // default ordering capacity LOUDLY, and succeeds with the knob
    // raised — the r13-advice contract: totality is the caller's one
    // explicit choice away, never a silent misranking
    val blob = "x" * 300
    val docs = Seq((1L, s"$blob $blob a")).toDF("doc_id", "text")
    val e = intercept[org.apache.spark.SparkException] {
      TextAnalysis.docTopTerms(docs, "doc_id", "text", 2).collect()
    }
    assert(e.getMessage.contains("string_ord_longs") ||
      Option(e.getCause).exists(_.getMessage.contains("ordering capacity")))
    val ok = TextAnalysis.docTopTerms(docs, "doc_id", "text", 2, ordLongs = 64)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getString(1)).toMap
    assert(ok == Map((1L, 1) -> blob, (1L, 2) -> "a"))
    assert(TextAnalysis.bm25TopTerms(docs, "doc_id", "text", 1, ordLongs = 64)
      .count() == 1L)
    assert(TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", 1, ordLongs = 64)
      .count() == 1L)
  }

  test("dupGramFraction counts repeated n-gram occurrences") {
    val df = Seq(
      ("a b a b a", 0.6, 0.5),  // tokens: (5-2)/5; 2-grams ab,ba,ab,ba: (4-2)/4
      ("x y z", 0.0, 0.0),
      ("", 0.0, 0.0)
    ).toDF("text", "d1", "d2")
    val got = df.select($"d1", $"d2",
      TextAnalysis.dupGramFraction($"text", 1).as("g1"),
      TextAnalysis.dupGramFraction($"text", 2).as("g2")).collect()
    got.foreach { r =>
      assert(r.getDouble(2) === r.getDouble(0))
      assert(r.getDouble(3) === r.getDouble(1))
    }
  }

  test("native dupGramFraction equals the HOF gram specification on the corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    Seq(1, 2, 3).foreach { n =>
      val hofFrac = {
        val g = TextAnalysis.wordGrams($"text", n)
        when(size(g) > 0,
          (size(g) - size(array_distinct(g))) * lit(1.0) / size(g))
          .otherwise(lit(0.0))
      }
      val diff = docs.select(
        TextAnalysis.dupGramFraction($"text", n).as("native"),
        hofFrac.as("hof"))
        .filter($"native" =!= $"hof").count()
      assert(diff == 0, s"n=$n: hash-distinct count must equal string-distinct")
    }
  }

  test("redactPii: URL wins over embedded email, digit runs last") {
    val df = Seq(
      "mail me@x.com or see https://a.b/?e=me@x.com id 1234567",
      "clean text").toDF("text")
    val out = df.select(TextAnalysis.redactPii($"text")).as[String].collect()
    assert(out(0) === "mail [EMAIL] or see [URL] id [NUM]")
    assert(out(1) === "clean text")
  }

  test("chunkTokens windows overlap by size-stride; short and empty docs chunk once") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b"),
      (3L, ""),
      (4L, null.asInstanceOf[String]) // must not be dropped
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(docs, "doc_id", "text", 4, 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getInt(3))).toMap
    // doc 1: ceil((10-4)/3)+1 = 3 chunks at offsets 0,3,6
    assert(out((1L, 0)) == (("t1 t2 t3 t4", 4)))
    assert(out((1L, 1)) == (("t4 t5 t6 t7", 4)))
    assert(out((1L, 2)) == (("t7 t8 t9 t10", 4)))
    assert(out((2L, 0)) == (("a b", 2)))
    assert(out((3L, 0)) == (("", 0)))
    assert(out((4L, 0)) == (("", 0)), "null text chunks once, not dropped")
    assert(out.size == 6)
  }

  test("tfidfTopTerms ranks by rational tf*N/df with token tie-break") {
    val docs = Seq(
      (1L, "rare common common"),
      (2L, "common common common"),
      (3L, "common other")).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", 1)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(4))).toMap
    // doc 1: rare tf=1 df=1 w=3.0; common tf=2 df=3 w=2.0 -> rare wins
    assert(top(1L) === (("rare", 3.0)))
    assert(top(2L) === (("common", 3.0)))
    // doc 3: common 1*3/3=1.0, other 1*3/1=3.0
    assert(top(3L) === (("other", 3.0)))
  }

  test("bm25TopTerms: saturation and length norm behave; dl is the token count") {
    val docs = Seq(
      (1L, "rare common common"),
      (2L, "common common common common common common"),
      (3L, "common other")).toDF("doc_id", "text")
    val rows = TextAnalysis.bm25TopTerms(docs, "doc_id", "text", 2).collect()
    val byDocTok = rows.map(r => (r.getLong(0), r.getString(1)) -> r).toMap
    // dl = whole-doc token count, not the per-term tf
    assert(byDocTok((1L, "rare")).getAs[Long]("dl") == 3L)
    assert(byDocTok((2L, "common")).getAs[Long]("dl") == 6L)
    // rare (df=1) outranks common (df=3) in doc 1
    assert(byDocTok((1L, "rare")).getAs[Int]("rk") == 1)
    // saturation: 6 occurrences of common score < 6× one occurrence
    val w6 = byDocTok((2L, "common")).getAs[Double]("weight")
    val w1 = byDocTok((3L, "common")).getAs[Double]("weight")
    assert(w6 < 6 * w1 && w6 > w1 * 0) // saturated but same idf sign
  }

  test("segmentPrune drops corpus-frequent lines, keeps order, empties survive") {
    // C4-style: the cookie-banner line appears in 3 of 4 docs (> maxDf=2)
    // and every occurrence goes; unique lines keep their original order
    val docs = Seq(
      (1L, "accept cookies\nreal content one\nmore text"),
      (2L, "accept cookies\nreal content two"),
      (3L, "accept cookies"),
      (4L, "standalone line"),
      (5L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.segmentPrune(docs, "doc_id", "text", "\n", maxDf = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("real content one\nmore text", 3L, 1L)))
    assert(out(2L) == (("real content two", 2L, 1L)))
    assert(out(3L) == (("", 1L, 1L))) // all segments dropped -> empty, not null
    assert(out(4L) == (("standalone line", 1L, 0L)))
    assert(out(5L) == (("", 0L, 0L)))
  }

  test("segmentPrune forced anti-join path (hotLiteralCap=0) is " +
    "bit-identical to the literal path") {
    val docs = Seq(
      (1L, "accept cookies\nreal content one\nmore text"),
      (2L, "accept cookies\nreal content two"),
      (3L, "accept cookies"),
      (4L, "standalone line"),
      (5L, "")).toDF("doc_id", "text")
    def run() = TextAnalysis
      .segmentPrune(docs, "doc_id", "text", "\n", maxDf = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val fast = run()
    System.setProperty("graft.text.hotLiteralCap", "0")
    try assert(run() == fast)
    finally System.clearProperty("graft.text.hotLiteralCap")
  }

  test("segmentPrune NULL and duplicated doc ids: per-ROW semantics on " +
    "both paths (the join path must not merge or lose degenerate ids)") {
    // two rows share id 7 with different texts; one row has a NULL id;
    // "hot" appears in 3 rows (> maxDf=2) so both paths have work to do
    val docs = Seq(
      (java.lang.Long.valueOf(7L), "hot\nkeep one"),
      (java.lang.Long.valueOf(7L), "hot\nkeep two"),
      (null.asInstanceOf[java.lang.Long], "hot\nkeep three"),
      (java.lang.Long.valueOf(8L), "plain")).toDF("doc_id", "text")
    def run() = TextAnalysis
      .segmentPrune(docs, "doc_id", "text", "\n", maxDf = 2)
      .collect()
      .map(r => ((if (r.isNullAt(0)) null else r.getLong(0)): Any,
        r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (String.valueOf(t._1), t._2))
    val literal = run()
    // each source ROW keeps its own row: ids 7,7,null,8 all present
    assert(literal.toSeq == Seq(
      (7L, "keep one", 2L, 1L),
      (7L, "keep two", 2L, 1L),
      (8L, "plain", 1L, 0L),
      (null, "keep three", 2L, 1L)))
    System.setProperty("graft.text.hotLiteralCap", "0")
    try assert(run().toSeq == literal.toSeq)
    finally System.clearProperty("graft.text.hotLiteralCap")
  }

  test("segmentPrune with a duplicated segment inside ONE doc counts df once") {
    // df is DOCUMENT frequency: the repeated line within doc 1 counts as
    // one doc, so df=2 <= maxDf=2 and nothing is dropped
    val docs = Seq(
      (1L, "x\nx\ny"),
      (2L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.segmentPrune(docs, "doc_id", "text", "\n", maxDf = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "x\nx\ny")
    assert(out(2L) == "x")
  }

  test("gopherQualityFlags: each rule flips on its own boundary case") {
    val docs = Seq(
      // passes everything (with minWords=3): 4 words, mean len in
      // [3,10], no symbols, all alphabetic, two stopwords
      (1L, "the cat is here"),
      // word count below min
      (2L, "the is"),
      // mean word length too small: 4 one-char words (mean 1 < 3)
      (3L, "a b c d"),
      // symbol ratio: 1 symbol token of 4 words > 0.1
      (4L, "the # is here"),
      // alpha fraction: 2 numeric of 4 (0.5 < 0.8)
      (5L, "the 42 17 is"),
      // fewer than 2 stopwords
      (6L, "cats chase shiny mice")).toDF("doc_id", "text")
    val out = TextAnalysis
      .gopherQualityFlags(docs, "doc_id", "text", minWords = 3L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("gopher_keep"))
    assert(!out(2L).getAs[Boolean]("flag_word_count"))
    assert(!out(3L).getAs[Boolean]("flag_mean_word_len"))
    assert(!out(4L).getAs[Boolean]("flag_symbol_ratio"))
    assert(!out(5L).getAs[Boolean]("flag_alpha_words"))
    assert(!out(6L).getAs[Boolean]("flag_stopwords"))
    assert(Seq(2L, 3L, 4L, 5L, 6L).forall(i => !out(i).getAs[Boolean]("gopher_keep")))
  }

  test("bm25 weight_q is the hand-computed exact integer rational") {
    // one tiny corpus where every piece of the rational is checkable by
    // hand with BigInt: weight = (2N-2df+1)*22*tf*T / ((2df+1)*(10*tf*T
    // + 3*T + 9*dl*N)), weight_q = wNum*10^12 div wDen
    val docs = Seq(
      (1L, "rare common common"),
      (2L, "common common common common common common"),
      (3L, "common other")).toDF("doc_id", "text")
    val n = BigInt(3)                      // N docs
    val t = BigInt(11)                     // T = total tokens (3 + 6 + 2)
    def wq(tf: Long, df: Long, dl: Long): Long = {
      val num = (2 * n - 2 * df + 1) * 22 * tf * t * BigInt(10).pow(12)
      val den = (2 * df + 1) * (10 * tf * t + 3 * t + 9 * dl * n)
      (num / den).toLong
    }
    val rows = TextAnalysis.bm25TopTerms(docs, "doc_id", "text", 2).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getAs[Long]("weight_q")).toMap
    assert(rows((1L, "rare")) == wq(tf = 1, df = 1, dl = 3))
    assert(rows((1L, "common")) == wq(tf = 2, df = 3, dl = 3))
    assert(rows((2L, "common")) == wq(tf = 6, df = 3, dl = 6))
    assert(rows((3L, "other")) == wq(tf = 1, df = 1, dl = 2))
  }

  test("tfidf tf-frame persist is conditional on the corpus size " +
    "estimate: no cache below the crossover, cache above it") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // The 2-consumer cache arithmetic is SCALE-DEPENDENT (r14, both
    // sides measured in one window): below the ~2 MiB crossover the
    // cache write loses (sf0.1 1.28 s no-persist vs 1.48 s persisted —
    // the r12→r13 pair's 1.09 → 1.73 s regression), above it the saved
    // second tokenize wins (10× corpus 3.87 s vs 4.55 s). This test
    // pins BOTH branches so a future unconditional cleanup in either
    // direction trips over the measurement history. bm25 (3 consumers)
    // stays unconditionally cached — its pin is below.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    def plansOf(df: org.apache.spark.sql.DataFrame) = {
      val plan = df.queryExecution.executedPlan
      (plan.collect { case s: InMemoryTableScanExec => s },
        plan.collect {
          case f: FileSourceScanExec if f.output.exists(_.name == "text") => f
        })
    }
    try {
      // fixture corpus is far below the default crossover → no cache
      val (cacheScans, textScans) =
        plansOf(TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", 3))
      assert(cacheScans.isEmpty,
        s"sub-crossover tfidf must not persist its tf frame, found " +
          s"${cacheScans.size} cache scans")
      // AQE-off planner ReuseExchange dedupes the shared subtree here
      // (runtime AQE executes it twice — the accepted sub-crossover cost)
      assert(textScans.nonEmpty,
        "tokenize must be in-plan (not cached) below the crossover")
      // forced-tiny crossover → the same corpus takes the cached branch
      val below = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", 3)
        .collect().map(_.toSeq).toSet
      sys.props("graft.text.tfidfCacheBytes") = "1"
      val aboveDf = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", 3)
      val (cacheScans2, _) = plansOf(aboveDf)
      assert(cacheScans2.nonEmpty,
        "above-crossover tfidf must read its tf frame from the cache")
      // the branch is a pure execution choice: values bit-identical
      assert(aboveDf.collect().map(_.toSeq).toSet == below,
        "cached and uncached tfidf branches must return identical rows")
    } finally {
      sys.props.remove("graft.text.tfidfCacheBytes")
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      TextAnalysis.releaseCaches()
    }
  }

  test("bm25 tokenizes the corpus ONCE: tf frame cached, no text scan " +
    "in the consuming plan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // bm25's three tf consumers (row side, df-by-token, total-tokens)
    // read the PERSISTED compact tf frame — at runtime under AQE the
    // exchange-reuse path the old shape relied on does not fire, so the
    // cache is the one-tokenize guarantee at any scale. AQE off for the
    // assertion only: adaptive plans wrap cache scans in query stages
    // that a pre-execution collect can't see.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    val df = TextAnalysis.bm25TopTerms(docs, "doc_id", "text", 3)
    val plan = df.queryExecution.executedPlan
    val cacheScans = plan.collect { case s: InMemoryTableScanExec => s }
    assert(cacheScans.size >= 3,
      s"expected all three tf consumers on the cache, found ${cacheScans.size}")
    val textScans = plan.collect {
      case f: FileSourceScanExec if f.output.exists(_.name == "text") => f
    }
    assert(textScans.isEmpty,
      s"tokenize must run only inside the cached tf frame, found " +
        s"${textScans.size} corpus text scans in the consuming plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      TextAnalysis.releaseCaches()
    }
  }

  test("bigramPairs: per-doc adjacency, no cross-document pairs") {
    val docs = Seq((1L, "a b c"), (2L, "c d"), (3L, "x"), (4L, "")).toDF("id", "text")
    val pairs = TextAnalysis.bigramPairs(docs, "text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(pairs.sorted == Seq(("a", "b"), ("b", "c"), ("c", "d")))
  }

  test("pmiBigrams: planted collocation tops chance pairs") {
    // "san francisco" always adjacent; fillers vary so no other pair
    // reaches the min-count floor
    val docs = (1 to 10).map(i =>
      (i.toLong, s"san francisco w$i san francisco x$i")).toDF("id", "text")
    val out = TextAnalysis.pmiBigrams(docs, "text", minCount = 5L)
      .orderBy(col("lift").desc, col("w1"), col("w2")).collect()
    assert(out.nonEmpty)
    val top = out.head
    assert((top.getString(0), top.getString(1)) == (("san", "francisco")))
    assert(top.getAs[Long]("n") == 20L)
    // lift: p(s,f)=20/|pairs|, p(s)=p(f)=20/|tokens| — above 1
    assert(top.getAs[Double]("lift") > 1.0)
  }
}
