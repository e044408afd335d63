package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, SemanticDedup}

class SemanticDedupSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  /** Corpus plus half-scaled companions — deterministic cos ~1.0 pairs
    * (the same plant the oracle queries use). */
  private lazy val planted = {
    val companions = emb.filter(col("vec_id") < 8)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(0.5f)).as("embedding"))
    emb.select("vec_id", "embedding").unionByName(companions)
  }

  test("assignClusters: every vector gets exactly one cell, cells are seeded ids") {
    val a = SemanticDedup.assignClusters(emb, "vec_id", "embedding", 16)
    val n = emb.count()
    assert(a.count() == n, "one row per vector")
    assert(a.select("id").distinct().count() == n, "one cell per vector")
    val cids = a.select("cid").distinct().collect().map(_.getLong(0)).toSet
    assert(cids.subsetOf((0L until 16L).toSet), s"cells beyond seeds: $cids")
  }

  test("planted companions land in their source's cell (structural recall)") {
    val a = SemanticDedup.assignClusters(planted, "vec_id", "embedding", 16)
      .select("id", "cid").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 8L).foreach { src =>
      assert(a(src + 100000L) == a(src),
        s"companion of $src split from its source cell")
    }
  }

  test("semanticPairs finds exactly the exact-sweep pairs that share a cell") {
    val pairs = SemanticDedup.semanticPairs(planted, "vec_id", "embedding",
      threshold = 0.9, nCentroids = 16)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    val exact = Dedup.cosinePairs(planted, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // within-cell pairs are a SUBSET of the exact sweep with identical scores
    pairs.foreach { case (k, cos) =>
      assert(exact.contains(k), s"false positive $k")
      assert(exact(k) == cos, s"cosine not bit-identical at $k")
    }
    // the 8 planted pairs are structurally recalled (same direction ⇒ same cell)
    (0L until 8L).foreach { src =>
      assert(pairs.contains((src, src + 100000L)), s"planted pair $src missed")
    }
  }

  test("semanticSurvivors drops exactly the dominated ids") {
    val pairs = SemanticDedup.semanticPairs(planted, "vec_id", "embedding",
      0.9, 16).select("vec_j").collect().map(_.getLong(0)).toSet
    val survivors = SemanticDedup.semanticSurvivors(planted, "vec_id",
      "embedding", 0.9, 16).collect().map(_.getLong(0)).toSet
    val all = planted.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(survivors == all -- pairs)
    // every planted companion is dominated by its smaller source id
    (0L until 8L).foreach(src => assert(!survivors.contains(src + 100000L)))
  }

  test("k-means refinement (iters > 0) is deterministic and keeps the row contract") {
    def run() = SemanticDedup.assignClusters(emb, "vec_id", "embedding",
      nCentroids = 8, iters = 2)
      .select("id", "cid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq
    val a = run()
    assert(a == run(), "refined assignment must replan byte-identically")
    assert(a.length == emb.count())
  }

  test("hash-seeded centroids: deterministic, planted pairs recalled, top-k plan") {
    def run() = SemanticDedup.semanticPairs(planted, "vec_id", "embedding",
      0.9, 16, 0, seedByHash = true)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val pairs = run()
    assert(pairs == run(), "hash seeding must be deterministic")
    // same-direction companions share every centroid cosine ⇒ same cell
    (0L until 8L).foreach(src => assert(pairs.contains((src, src + 100000L)),
      s"planted pair $src missed under hash seeding"))
    // the seed subtree must be a distributed top-k, not a global sort
    val plan = SemanticDedup.assignClusters(emb, "vec_id", "embedding", 16,
      0, seedByHash = true).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"hash seeding should plan as TakeOrderedAndProject:\n$plan")
  }

  test("refined pairs still score bit-identically to the exact sweep") {
    val pairs = SemanticDedup.semanticPairs(planted, "vec_id", "embedding",
      threshold = 0.9, nCentroids = 8, iters = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    val exact = Dedup.cosinePairs(planted, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    pairs.foreach { case (k, cos) =>
      assert(exact.get(k).contains(cos), s"refined pair $k not in exact sweep")
    }
    (0L until 8L).foreach { src =>
      assert(pairs.contains((src, src + 100000L)),
        s"planted pair $src missed after refinement")
    }
  }
}
