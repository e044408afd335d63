package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** Integer PageRank: hand-computed rank values on tiny graphs (the
  * recursion is exact integer arithmetic, so the expectations are exact
  * longs, not tolerances), the dangling-mass contract, and
  * repartition-invariance of the whole loop. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000000L

  private def ranksOf(edges: Seq[(String, String)], iters: Int,
                      parts: Option[Int] = None): Map[String, Long] = {
    val base = edges.toDF("src", "dst")
    val df = parts.map(base.repartition(_)).getOrElse(base)
    Graph.pageRank(df, "src", "dst", iters)
      .as[(String, Long)].collect().toMap
  }

  test("symmetric 2-cycle is stationary at S/2 per node") {
    val r = ranksOf(Seq(("a", "b"), ("b", "a")), iters = 3)
    assert(r == Map("a" -> 500000000000L, "b" -> 500000000000L))
  }

  test("directed edge: source keeps only teleport mass, sink absorbs (dangling drops)") {
    // n=2: teleport = (S*15) div (100*2) = 75e9; a has no in-edges;
    // b's dangling outflow vanishes (documented variant)
    val r1 = ranksOf(Seq(("a", "b")), iters = 1)
    assert(r1 == Map("a" -> 75000000000L, "b" -> 500000000000L))
    // second round: b's mass is dangling, a stays at teleport, b gets
    // 85% of a's teleport mass on top of its own teleport
    val r2 = ranksOf(Seq(("a", "b")), iters = 2)
    assert(r2 == Map("a" -> 75000000000L, "b" -> 138750000000L))
  }

  test("3-spoke star: exact hub trajectory over two rounds") {
    val edges = Seq(("s1", "h"), ("s2", "h"), ("s3", "h"))
    // n=4: r0 = 25e10 each; teleport = (S*15) div 400 = 37.5e9
    val r1 = ranksOf(edges, iters = 1)
    assert(r1("h") == 675000000000L)
    assert(r1("s1") == 37500000000L && r1("s2") == 37500000000L)
    val r2 = ranksOf(edges, iters = 2)
    // c2(h) = 3 * (37.5e9 div 1); r2(h) = 37.5e9 + (85 * 112.5e9) div 100
    assert(r2("h") == 133125000000L)
    assert(r2("s3") == 37500000000L)
  }

  test("iters = 0 returns the uniform S div n vector") {
    val r = ranksOf(Seq(("a", "b"), ("b", "c"), ("c", "a")), iters = 0)
    assert(r.values.toSet == Set(S / 3))
    assert(r.keySet == Set("a", "b", "c"))
  }

  test("ranks are invariant under input repartitioning") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
      ("d", "a"), ("b", "d"))
    assert(ranksOf(edges, iters = 5) == ranksOf(edges, iters = 5, parts = Some(7)))
  }

  private def propagate(edges: Seq[(String, String)], seeds: Seq[(String, String)],
                        iters: Int): Map[String, Option[String]] = {
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    Graph.labelPropagate(sym.toDF("src", "dst"), "src", "dst",
        seeds.toDF("node", "label"), "node", "label", iters)
      .as[(String, Option[String])].collect().toMap
  }

  test("label propagation: line graph spreads from both ends, ties to smallest label") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"))
    val seeds = Seq(("a", "L1"), ("d", "L2"))
    val r1 = propagate(edges, seeds, iters = 1)
    assert(r1 == Map("a" -> Some("L1"), "b" -> Some("L1"),
      "c" -> Some("L2"), "d" -> Some("L2")))
    // round 2: b and c each see {L1, L2} — count tie resolves to L1
    val r2 = propagate(edges, seeds, iters = 2)
    assert(r2 == Map("a" -> Some("L1"), "b" -> Some("L1"),
      "c" -> Some("L1"), "d" -> Some("L2")))
  }

  test("label propagation: seeds are clamped against any majority") {
    // x seeded L2, all three neighbors labeled L1 — x must stay L2
    val edges = Seq(("n1", "x"), ("n2", "x"), ("n3", "x"))
    val seeds = Seq(("x", "L2"), ("n1", "L1"), ("n2", "L1"), ("n3", "L1"))
    val r = propagate(edges, seeds, iters = 3)
    assert(r("x").contains("L2"))
  }

  test("label propagation: unreached nodes stay null, isolated seeds persist") {
    val edges = Seq(("a", "b"), ("c", "d")) // two components; only a-b seeded
    val r = propagate(edges, Seq(("a", "L1"), ("z", "L9")), iters = 2)
    assert(r("b").contains("L1"))
    assert(r("c").isEmpty && r("d").isEmpty)
    assert(r("z").contains("L9")) // seed with no edges still appears
  }

  test("label propagation: majority beats minority among neighbors") {
    val edges = Seq(("p1", "x"), ("p2", "x"), ("q1", "x"))
    val seeds = Seq(("p1", "B"), ("p2", "B"), ("q1", "A"))
    val r = propagate(edges, seeds, iters = 1)
    assert(r("x").contains("B")) // 2×B beats 1×A despite A < B lexically
  }

  test("weighted PageRank: proportional split, exact one-round values") {
    // a -> b (w=3), a -> c (w=1): b gets 3/4 of a's rank, integer-floor
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L)).toDF("src", "dst", "w")
    val r = Graph.pageRankWeighted(edges, "src", "dst", "w", iters = 1)
      .as[(String, Long)].collect().toMap
    assert(r("a") == 50000000000L) // teleport only: (S*15) div 300
    assert(r("b") == 50000000000L + (85L * (333333333333L * 3 / 4)) / 100)
    assert(r("c") == 50000000000L + (85L * (333333333333L / 4)) / 100)
  }

  test("weighted PageRank with unit weights is bit-identical to pageRank") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a"))
    val unweighted = ranksOf(edges, iters = 5)
    val weighted = Graph.pageRankWeighted(
        edges.map { case (s, d) => (s, d, 1L) }.toDF("src", "dst", "w"),
        "src", "dst", "w", iters = 5)
      .as[(String, Long)].collect().toMap
    assert(unweighted == weighted)
  }

  test("personalized PageRank: exact two-round trajectory from one seed") {
    import org.apache.spark.sql.functions.col
    def ppr(iters: Int): Map[String, Long] =
      Graph.pageRankPersonalized(
          Seq(("a", "b"), ("b", "a")).toDF("src", "dst"), "src", "dst",
          Seq("a").toDF("node"), "node", iters)
        .as[(String, Long)].collect().toMap
    assert(ppr(0) == Map("a" -> S, "b" -> 0L))
    assert(ppr(1) == Map("a" -> 150000000000L, "b" -> 850000000000L))
    assert(ppr(2) == Map("a" -> 872500000000L, "b" -> 127500000000L))
    // non-seed nodes never get teleport mass: with no inbound rank, 0
    val r = Graph.pageRankPersonalized(
        Seq(("a", "b")).toDF("src", "dst"), "src", "dst",
        Seq("z").toDF("node"), "node", iters = 1)
      .as[(String, Long)].collect().toMap
    assert(r == Map("a" -> 0L, "b" -> 0L, "z" -> 150000000000L))
  }

  test("rank mass never exceeds the scale and every node appears once") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "b"))
    val df = Graph.pageRank(edges.toDF("s", "d"), "s", "d", iters = 4)
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSet == Set("a", "b", "c"))
    assert(rows.map(_.getLong(1)).sum <= S)
    assert(rows.forall(_.getLong(1) > 0))
  }
  test("forced distributed loop (smallGraphCap=0) is bit-identical to " +
    "the driver fast path, all four operators") {
    // tiny fixtures take the driver path by default, which would leave
    // the distributed rounds untested: force them and pin equivalence
    val rng = new scala.util.Random(13)
    val edges = (1 to 300).map { _ =>
      (s"n${rng.nextInt(40)}", s"n${rng.nextInt(40)}", 1L + rng.nextInt(5)) }
      .filter { case (a, b, _) => a != b }
    val eDf = edges.toDF("src", "dst", "w")
    val seeds = Seq(("n1", "x"), ("n7", "y"), ("n19", "x"))
      .toDF("node", "lab")
    def all() = (
      Graph.pageRank(eDf, "src", "dst", iters = 3)
        .as[(String, Long)].collect().toMap,
      Graph.pageRankWeighted(eDf, "src", "dst", "w", iters = 3)
        .as[(String, Long)].collect().toMap,
      Graph.pageRankPersonalized(eDf, "src", "dst", seeds, "node", iters = 3)
        .as[(String, Long)].collect().toMap,
      Graph.labelPropagate(eDf, "src", "dst", seeds, "node", "lab", iters = 3)
        .as[(String, String)].collect().toMap)
    val fast = all()
    System.setProperty("graft.graph.smallGraphCap", "0")
    try assert(all() == fast)
    finally System.clearProperty("graft.graph.smallGraphCap")
  }
}
