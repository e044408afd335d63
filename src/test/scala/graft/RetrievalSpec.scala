package graft

import org.apache.spark.sql.functions._
import graft.ops.{Retrieval, Similarity}

class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("lexicalTopK ranks rare-token overlap above common-token overlap") {
    // query 0 shares the rare token 'zq' with doc 10 and the common
    // token 'the' (in every doc) with doc 11 — idf bits must rank 10 first
    val corpus = Seq(
      (10L, "zq alpha the"), (11L, "the beta gamma"), (12L, "delta the"),
      (13L, "epsilon the"), (14L, "zeta the")).toDF("doc_id", "text")
    val queries = Seq((0L, "zq the")).toDF("doc_id", "text")
    val out = Retrieval.lexicalTopK(corpus, queries, "doc_id", "text", k = 5)
      .orderBy("rk_lex").collect()
    assert(out.head.getLong(1) == 10L, "rare-token doc must rank first")
    // 'the' is in all 5 corpus docs -> idf_bits = bits(5) - bits(5) = 0,
    // so common-token-only docs tie at 0 and sort by id
    assert(out.map(_.getLong(1)).toSeq == Seq(10L, 11L, 12L, 13L, 14L))
  }

  test("lexicalTopK maxDf cap drops boilerplate postings") {
    val corpus = Seq(
      (10L, "the alpha"), (11L, "the beta"), (12L, "the gamma")
    ).toDF("doc_id", "text")
    val queries = Seq((0L, "the")).toDF("doc_id", "text")
    // 'the' has df=3 > maxDf=2: no candidate survives the cap
    val capped = Retrieval.lexicalTopK(corpus, queries, "doc_id", "text",
      k = 5, maxDf = 2L)
    assert(capped.count() == 0)
    // uncapped it matches all three
    val open = Retrieval.lexicalTopK(corpus, queries, "doc_id", "text", k = 5)
    assert(open.count() == 3)
  }

  test("rrfFuse: union semantics and the exact integer score") {
    val lex = Seq((0L, 100L, 1), (0L, 101L, 2)).toDF("query_id", "nn_id", "rk_lex")
    val vec = Seq((0L, 100L, 1), (0L, 102L, 2)).toDF("query_id", "nn_id", "rk")
    val out = Retrieval.rrfFuse(lex, vec, k = 3)
      .orderBy("rk").collect()
    // both-arms candidate 100 first: 10^12 div 61 twice
    assert(out(0).getLong(1) == 100L)
    assert(out(0).getLong(4) == 2 * (1000000000000L / 61L))
    // single-arm rank-2 candidates tie at 10^12 div 62, id tie-break
    assert(out(1).getLong(1) == 101L && out(2).getLong(1) == 102L)
    assert(out(1).getLong(4) == 1000000000000L / 62L)
    assert(out(2).getLong(4) == 1000000000000L / 62L)
    // absent arm rank is null
    assert(out(2).isNullAt(2) && !out(2).isNullAt(3))
  }

  test("hybridTopK on the fixtures: k per query, deterministic, fused arms") {
    def run() = Retrieval.hybridTopK(docs, emb, "doc_id", "text",
        "vec_id", "embedding", queryMaxId = 4, kArm = 10, k = 5, maxDf = 395L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getInt(5)))
      .toSeq.sorted
    val a = run()
    assert(a == run(), "hybrid fusion must be deterministic")
    val byQ = a.groupBy(_._1)
    assert(byQ.size == 4)
    byQ.values.foreach(rows => assert(rows.size == 5))
    assert(a.forall(_._3 > 0L), "every fused candidate scores > 0")
    assert(a.forall(r => r._1 != r._2), "self excluded from both arms")
  }

  test("postingsIndex + lexicalTopKFromPostings == lexicalTopK, bit for " +
    "bit through a parquet round-trip (the persisted-index equivalence, r17)") {
    val queries = docs.filter(col("doc_id") < 5)
    val direct = Retrieval.lexicalTopK(docs, queries, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).sorted.toSeq
    val path = java.nio.file.Files.createTempDirectory("post-idx").toString
    Retrieval.postingsIndex(docs, "doc_id", "text")
      .write.mode("overwrite").parquet(path)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val indexed = Retrieval.lexicalTopKFromPostings(
      spark.read.parquet(path), nDocs, queries, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).sorted.toSeq
    assert(indexed == direct)
  }

  test("hybridTopK agrees with manually fused arms") {
    val lex = Retrieval.lexicalTopK(docs, docs.filter(col("doc_id") < 4),
      "doc_id", "text", k = 10, maxDf = 395L)
    val vec = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 4),
      "vec_id", "embedding", 10)
    val manual = Retrieval.rrfFuse(lex, vec, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    val bundled = Retrieval.hybridTopK(docs, emb, "doc_id", "text",
        "vec_id", "embedding", queryMaxId = 4, kArm = 10, k = 5, maxDf = 395L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    assert(manual == bundled)
  }
}
