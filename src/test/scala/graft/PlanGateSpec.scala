package graft

/** Automated plan-regression gate: runs `PlanGate.violations` over the
  * static physical plan of EVERY `SparkEntry.queries` entry against the
  * sf0.01 fixtures (the correctness-gate scale, so join-strategy
  * size thresholds match what the driver runs).
  *
  * This replaces the manual per-round plan audit: a change that
  * reintroduces a single-partition funnel (e.g. an unpartitioned window),
  * degenerates a join to a cartesian/nested-loop, or stops a filter from
  * reaching a parquet scan fails HERE, named per query, instead of
  * surviving until a human reads 110 plans.
  *
  * The allowlist is exact (violation multiset per query) so an
  * allowlisted query acquiring a SECOND violation still fails.
  */
class PlanGateSpec extends SparkSpec {
  private val gateSf = "/root/testdata/sf0.01"

  /** Deliberate, documented exceptions — each is a broadcast nested loop
    * whose broadcast side is a small frame by CONTRACT (not provable from
    * the plan): ANN query sets and IVF centroid lists, and the exact
    * cosine all-pairs oracle anchor (guarded by a row-count cap at
    * construction; `cosinePairsLshAuto` is the scale path). */
  private val allow: Map[String, Seq[String]] = Map(
    "q_dedup_cosine"       -> Seq("broadcast-nested-loop"),
    "q_sim_bruteforce_topk" -> Seq("broadcast-nested-loop"),
    "q_sim_ivf_topk"       -> Seq("broadcast-nested-loop", "broadcast-nested-loop")
  )

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"plan gate: $name") {
      val df = SparkEntry.queries(name)(spark, gateSf)
      val vs = PlanGate.violations(df).sorted
      assert(vs == allow.getOrElse(name, Nil).sorted,
        s"plan violations for $name: ${vs.mkString(", ")} " +
          s"(allowed: ${allow.getOrElse(name, Nil).mkString(", ")})\n" +
          PlanGate.staticPlan(df).toString.linesIterator.take(60).mkString("\n"))
    }
  }
}
