package graft

import graft.ops.LanguageModel

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  private def bits(c: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(c)

  /** Driver-side reference: corpus bigram/unigram counts, per-doc sums. */
  private def expected(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty).toSeq }
    val uni = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bis = toks.map { case (id, tk) => id -> tk.sliding(2).filter(_.size == 2).toSeq }
    val bc = bis.flatMap(_._2).map(_.mkString(" "))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    docs.map { case (id, _) =>
      val b = bis.find(_._1 == id).get._2
      val ll = b.map(p => bits(bc(p.mkString(" "))) - bits(uni(p.head))).sum
      val uq = b.count(p => bc(p.mkString(" ")) == 1L).toLong
      id -> ((b.size.toLong, ll, uq))
    }.toMap
  }

  test("bigramBitScores equals the driver-side count model on a hand corpus") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the hat"),
      (3L, "a completely different sentence structure here"),
      (4L, "the cat sat on the mat"), // exact dup of 1 — all bigrams common
      (5L, "single"),                 // < 2 tokens -> zeros
      (6L, ""))                       // empty -> zeros
    val got = LanguageModel.bigramBitScores(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == expected(docs))
    assert(got(5L) == ((0L, 0L, 0L)) && got(6L) == ((0L, 0L, 0L)))
    // unique-sentence doc is all singleton bigrams — but its unigrams are
    // singletons too, so each term contributes bits(1) - bits(1) = 0: the
    // novelty signal for it lives in uniq_bigrams, not ll_bits
    assert(got(3L) == ((5L, 0L, 5L)))
  }

  test("scores are invariant to partitioning (sum/count are order-free)") {
    val df = (1 to 300).map(i => (i.toLong, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 11}"))
      .toDF("doc_id", "text")
    val a = LanguageModel.bigramBitScores(df.repartition(13), "doc_id", "text")
      .collect().toSet
    val b = LanguageModel.bigramBitScores(df.coalesce(1), "doc_id", "text")
      .collect().toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("self-trained model: every bigram count >= 1, so ll_bits <= 0") {
    val df = (1 to 100).map(i => (i.toLong, s"a b c d${i % 4} e f"))
      .toDF("doc_id", "text")
    val rows = LanguageModel.bigramBitScores(df, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.forall(_._3 <= 0L))
  }

  test("foreign-reference scoring: unseen-bigram penalty and OOV classes") {
    // ref: "a b a b" -> cu(a)=2, cu(b)=2, cb("a b")=2, cb("b a")=1
    val ref = Seq((100L, "a b a b")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c"), // "a b": bits(2)-bits(2)=0; "b c" unseen: -bits(2)=-1
      (2L, "z z"),   // head z OOV: floors cancel, 0 bits, both miss classes
      (3L, ""))      // empty: all zeros
      .toDF("doc_id", "text")
    val r = LanguageModel.bigramBitScoresAgainst(ref, docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(r(0) == ((1L, 2L, -1L, 1L, 0L)))
    assert(r(1) == ((2L, 1L, 0L, 1L, 1L)))
    assert(r(2) == ((3L, 0L, 0L, 0L, 0L)))
  }
}
