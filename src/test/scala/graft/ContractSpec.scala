package graft

/** Driver-contract guards: every query has an oracle (the repo's
  * "no rows-only checks" claim, machine-enforced), names are unique
  * across the map unions, and the smoke entry returns rows — the
  * driver's t1 gate, pinned as a test so a regression fails here
  * before it fails a round. */
class ContractSpec extends SparkSpec {

  test("every SparkEntry query has an oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries missing oracles: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without queries: ${(o -- q).toSeq.sorted}")
  }

  test("query-map unions never shadow a name") {
    // ALL four constituents of the ++ union, the inline base map
    // (marts/dup_check/reconcile_*) included — a base key colliding
    // with a pipeline key would shadow just as silently
    val maps = Seq(
      SparkEntry.baseQueries.keySet,
      graft.pipelines.OperatorQueries.all.keySet,
      graft.pipelines.ExtensionQueries.queries.keySet,
      graft.pipelines.ModelQueries.queries.keySet)
    val pairwise = maps.combinations(2).flatMap { case Seq(a, b) => a & b }.toSet
    assert(pairwise.isEmpty, s"shadowed query names: ${pairwise.toSeq.sorted}")
    // and the union must be size-additive — catches any collision the
    // pairwise sweep would miss if a constituent list goes stale
    assert(SparkEntry.queries.size == maps.map(_.size).sum,
      "query-map union lost entries to shadowing")
  }

  test("smoke entry returns rows on the smallest fixture") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1L)
  }
}
