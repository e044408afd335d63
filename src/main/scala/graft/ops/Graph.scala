package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph centrality as pure dataflow — fixed-iteration PageRank with
  * the whole recursion in SCALED INTEGER arithmetic, so every rank is
  * bit-exact across engines (a SQL oracle replays the iterations as
  * unrolled aggregate-join CTEs with `//` division; nothing depends on
  * float summation order or libm). The training-data uses: TextRank
  * keyword extraction over the word co-occurrence graph (see
  * [[graft.pipelines.ModelQueries]]), canonical-representative
  * selection inside near-dup clusters, and domain-authority weighting
  * when a crawl's host-link graph is available.
  *
  * Recursion (damping d = dampNum/dampDen, mass scale S):
  * {{{
  *   r⁰(v)   = S div n
  *   rᵏ⁺¹(v) = (S·(dampDen−dampNum)) div (dampDen·n)
  *           + (dampNum · Σ_{u→v} (rᵏ(u) div deg⁺(u))) div dampDen
  * }}}
  * All quantities are nonnegative longs, so `div` (truncating) and
  * floor division agree and DuckDB `//` replays it exactly. Dangling
  * mass (nodes with no out-edges) is dropped, the common practical
  * variant — ranks still order identically for connected graphs and
  * the contract is stated rather than hidden.
  *
  * Scale shape: each iteration is ONE equi-join of the edge list
  * against the current rank vector (hash-partitioned on the node key)
  * plus a map-side-combined sum per destination — the canonical
  * message-passing round. The edge list is persisted once; each rank
  * generation is localCheckpoint'd (or reliably checkpointed under
  * `checkpointDir`, [[Dedup.nearDupClusters]]'s executor-loss posture)
  * so the loop body never re-executes upstream lineage and the logical
  * plan stays O(1) deep per round. Iteration count is a fixed small
  * constant (centrality needs ~5–20 rounds), so total cost is
  * iters × |E| shuffle — no driver-side state beyond loop control.
  */
object Graph {

  /** Integer PageRank over a directed edge list (`srcCol`, `dstCol`).
    * The caller supplies the exact edge multiset — pre-`distinct` it
    * for an unweighted graph (parallel edges otherwise count as
    * multi-edges, which is also a valid weighting). Returns one row
    * per node: (`node`, `rank_scaled`) with Σ rank ≤ `scale`. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, scale: Long = 1000000000000L,
               dampNum: Int = 85, dampDen: Int = 100,
               checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampNum >= 0 && dampNum <= dampDen && dampDen > 0,
      s"damping $dampNum/$dampDen outside [0,1]")
    val spark = edges.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)

    val e = edges.select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"), lit(1L).as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outdeg = e.groupBy("src").agg(sum("w").as("wsum"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // node count rides the 1-row-broadcast compact-producer protocol —
    // the loop below needs it in every generation's teleport term
    val nTotal = nodes.agg(count(lit(1)).as("n"))

    val base = nodes.crossJoin(broadcast(nTotal))
      .select(col("node"),
        expr(s"(${scale}L * ${dampDen - dampNum}) div (${dampDen}L * n)").as("base"),
        expr(s"${scale}L div n").as("r0"))
    val ranks = prLoop(e, outdeg, base, iters, dampNum, dampDen, checkpointDir)
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    outdeg.unpersist(blocking = false)
    ranks
  }

  /** WEIGHTED PageRank: each node splits its rank among out-edges in
    * proportion to integer edge weights (co-occurrence counts, link
    * multiplicities) — `rᵏ(u)·w(u→v) div Σw(u→·)` replaces the uniform
    * split; with all weights 1 the recursion is bit-identical to
    * [[pageRank]]. Same determinism/checkpoint contract. Weights must
    * be ≥ 1: a node whose out-weights sum to 0 divides by zero, which
    * Spark's `div` nulls but a SQL `//` replay rejects — the contract
    * is integer COUNTS. Overflow bound: rank·weight must fit LONG, so
    * per-edge weights must stay ≤ ~9·10⁶ at the default scale —
    * pre-divide heavier weights by a common factor (the split is
    * ratio-invariant only up to integer truncation, so state the
    * factor where it matters). */
  def pageRankWeighted(edges: DataFrame, srcCol: String, dstCol: String,
                       weightCol: String, iters: Int,
                       scale: Long = 1000000000000L,
                       dampNum: Int = 85, dampDen: Int = 100,
                       checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampNum >= 0 && dampNum <= dampDen && dampDen > 0,
      s"damping $dampNum/$dampDen outside [0,1]")
    val spark = edges.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)

    val e = edges.select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"),
        col(weightCol).cast("long").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outdeg = e.groupBy("src").agg(sum("w").as("wsum"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nTotal = nodes.agg(count(lit(1)).as("n"))

    val base = nodes.crossJoin(broadcast(nTotal))
      .select(col("node"),
        expr(s"(${scale}L * ${dampDen - dampNum}) div (${dampDen}L * n)").as("base"),
        expr(s"${scale}L div n").as("r0"))
    val ranks = prLoop(e, outdeg, base, iters, dampNum, dampDen, checkpointDir)
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    outdeg.unpersist(blocking = false)
    ranks
  }

  /** PERSONALIZED PageRank: teleport mass restricted to a seed node set
    * — "what is structurally close to THESE documents" (related-item
    * expansion from a labeled subset, contamination-neighborhood
    * spreading). Recursion and determinism contract as [[pageRank]],
    * except r⁰ and the teleport term put `S div |seeds|` /
    * `(S·(1−d)) div |seeds|` on seed nodes and 0 elsewhere — so all
    * rank mass is reachable-from-seeds by construction. Seeds not in
    * the edge list still rank (their teleport never leaves them). */
  def pageRankPersonalized(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: DataFrame, seedCol: String,
                           iters: Int, scale: Long = 1000000000000L,
                           dampNum: Int = 85, dampDen: Int = 100,
                           checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampNum >= 0 && dampNum <= dampDen && dampDen > 0,
      s"damping $dampNum/$dampDen outside [0,1]")
    val spark = edges.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)

    val e = edges.select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"), lit(1L).as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val s = seeds.select(col(seedCol).cast("string").as("node")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .union(s.select("node")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outdeg = e.groupBy("src").agg(sum("w").as("wsum"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nSeeds = s.agg(count(lit(1)).as("ns"))

    val base = nodes.join(s.withColumn("__seed", lit(1L)), Seq("node"), "left")
      .crossJoin(broadcast(nSeeds))
      .select(col("node"),
        when(col("__seed").isNotNull,
          expr(s"(${scale}L * ${dampDen - dampNum}) div (${dampDen}L * ns)"))
          .otherwise(lit(0L)).as("base"),
        when(col("__seed").isNotNull, expr(s"${scale}L div ns"))
          .otherwise(lit(0L)).as("r0"))
    val ranks = prLoop(e, outdeg, base, iters, dampNum, dampDen, checkpointDir)
    e.unpersist(blocking = false)
    s.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    outdeg.unpersist(blocking = false)
    ranks
  }

  /** The shared damped message-passing loop: `base` carries each node's
    * per-round teleport term and starting rank. */
  private def prLoop(e: DataFrame, outdeg: DataFrame, base: DataFrame,
                     iters: Int, dampNum: Int, dampDen: Int,
                     checkpointDir: Option[String]): DataFrame = {
    val spark = e.sparkSession
    val b = base.persist(StorageLevel.MEMORY_AND_DISK)

    def checkpointGen(df: DataFrame)
        : (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
      val rdd = df.rdd
      if (checkpointDir.isDefined) {
        rdd.persist(StorageLevel.MEMORY_AND_DISK)
        rdd.checkpoint()
      } else rdd.localCheckpoint()
      (spark.createDataFrame(rdd, df.schema), rdd)
    }

    var (ranks, prevRdd) = checkpointGen(
      b.select(col("node"), col("r0").as("rank_scaled")))
    var iter = 0
    while (iter < iters) {
      val contrib = e
        .join(ranks.select(col("node").as("src"), col("rank_scaled").as("r")), "src")
        .join(outdeg, "src")
        .select(col("dst"), expr("(r * w) div wsum").as("c"))
        .groupBy("dst").agg(sum("c").as("cs"))
      val (next, nextRdd) = checkpointGen(
        b.join(contrib, col("node") === col("dst"), "left")
          .select(col("node"),
            (col("base") +
              expr(s"(${dampNum}L * coalesce(cs, 0L)) div ${dampDen}L")
            ).as("rank_scaled")))
      next.count() // materialize this generation, then free the previous
      prevRdd.unpersist(blocking = false)
      prevRdd = nextRdd
      ranks = next
      iter += 1
    }
    b.unpersist(blocking = false)
    ranks
  }

  /** Semi-supervised LABEL PROPAGATION: spread known labels through a
    * graph by iterated neighbor majority vote — the "label the unlabeled
    * duplicates/near-dups from their labeled cluster-mates" stage of a
    * partially-annotated corpus. Fully deterministic: per round, each
    * non-seed node takes the most common label among its in-neighbors'
    * current labels (count ties → lexicographically smallest label);
    * SEED nodes are clamped to their seed label forever; a node with no
    * labeled neighbor keeps its previous label (null until first
    * reached). Fixed `iters` rounds — a SQL oracle replays them as
    * unrolled aggregate-join CTEs, no float anywhere.
    *
    * Scale shape: per round, one edge⋈labels equi-join, one
    * (dst, label) count aggregation (map-side combined), one argmin-of
    * -struct per node — all hash-partitioned on node keys; generations
    * are checkpointed like [[pageRank]]'s so lineage stays O(1) deep.
    * Node set = edge endpoints ∪ seeds; pass the symmetrized edge list
    * for undirected propagation.
    *
    * `seeds`: (`nodeCol`, `labelCol`) — at most one row per node.
    * Returns (`node`, `label`), label null where propagation never
    * reached. */
  def labelPropagate(edges: DataFrame, srcCol: String, dstCol: String,
                     seeds: DataFrame, nodeCol: String, labelCol: String,
                     iters: Int,
                     checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val spark = edges.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)

    val e = edges.select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val s = seeds.select(col(nodeCol).cast("string").as("node"),
        col(labelCol).cast("string").as("seed"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .union(s.select("node")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    def checkpointGen(df: DataFrame)
        : (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
      val rdd = df.rdd
      if (checkpointDir.isDefined) {
        rdd.persist(StorageLevel.MEMORY_AND_DISK)
        rdd.checkpoint()
      } else rdd.localCheckpoint()
      (spark.createDataFrame(rdd, df.schema), rdd)
    }

    var (labels, prevRdd) = checkpointGen(
      nodes.join(s, Seq("node"), "left")
        .select(col("node"), col("seed").as("label")))
    var iter = 0
    while (iter < iters) {
      val maj = e
        .join(labels.filter(col("label").isNotNull)
          .select(col("node").as("src"), col("label").as("nl")), "src")
        .groupBy(col("dst"), col("nl")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("dst"))
        .agg(min(struct((-col("cnt")).as("neg"), col("nl").as("l"))).as("best"))
        .select(col("dst").as("node"), col("best.l").as("maj"))
      val (next, nextRdd) = checkpointGen(
        labels.join(s, Seq("node"), "left")
          .join(maj, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("seed"), col("maj"), col("label")).as("label")))
      next.count()
      prevRdd.unpersist(blocking = false)
      prevRdd = nextRdd
      labels = next
      iter += 1
    }
    e.unpersist(blocking = false)
    s.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    labels
  }
}
