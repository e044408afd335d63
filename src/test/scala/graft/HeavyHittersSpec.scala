package graft

import org.apache.spark.sql.functions._
import graft.ops.HeavyHitters

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish corpus: token t_i appears ~ N/i times — distinct tokens far
  // exceed the sketch capacity, so the decrement path genuinely runs
  private def zipfDocs(nTokens: Int, distinct: Int, seed: Int) = {
    val rng = new scala.util.Random(seed)
    // inverse-CDF sampling of a Zipf(1) law over `distinct` ranks
    val weights = (1 to distinct).map(1.0 / _)
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    val toks = Seq.fill(nTokens) {
      val u = rng.nextDouble() * total
      val rank = cum.indexWhere(u <= _) + 1
      s"t$rank"
    }
    toks.grouped(50).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
  }

  test("frequentTokens is exact: equals the brute-force GROUP BY answer " +
       "even with distinct tokens >> sketch capacity") {
    val docs = zipfDocs(nTokens = 20000, distinct = 500, seed = 11)
    val k = 20 // capacity 19 counters vs 500 distinct tokens
    val got = HeavyHitters.frequentTokens(docs, "text", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = docs.select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val n = toks.count()
    val want = toks.groupBy("token").count()
      .filter(col("count") * k > n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(want.nonEmpty, "zipf head must clear the n/k threshold")
    assert(got == want)
  }

  test("pass-1 summaries respect the k-1 counter bound; merged candidates " +
       "are a superset of the true heavy hitters") {
    val rng = new scala.util.Random(3)
    val stream = Seq.fill(5000)(s"w${rng.nextInt(300)}")
    val k = 10
    // simulate partitioned pass-1
    val parts = stream.grouped(700).map(g => HeavyHitters.mgSummarize(g.iterator, k)).toSeq
    parts.foreach { case (_, m) => assert(m.size <= k - 1) }
    val n = parts.map(_._1).sum
    assert(n == 5000)
    val cands = HeavyHitters.mgMerge(parts.iterator.map(_._2), k)
    assert(cands.size <= k - 1)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
    val trueHeavy = exact.filter { case (_, c) => c * k > n }.keys.toSet
    assert(trueHeavy.subsetOf(cands.keySet),
      s"missed heavy hitters: ${trueHeavy -- cands.keySet}")
  }

  test("empty and threshold-free corpora return an empty frame with the " +
       "right schema") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = HeavyHitters.frequentTokens(empty, "text", 5)
    assert(out.columns.toSeq == Seq("token", "cnt"))
    assert(out.count() == 0)
    // perfectly uniform over >= k tokens: nothing exceeds n/k
    val uniform = (0 until 60).map(i => (i.toLong, s"u${i % 6} u${i % 6}"))
      .toDF("doc_id", "text")
    assert(HeavyHitters.frequentTokens(uniform, "text", 6).count() == 0)
  }
}
