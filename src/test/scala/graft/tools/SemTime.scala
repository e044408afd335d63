package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time SemanticDedup on an embeddings.parquet directory
  * (sign-diagonal scale replicas included) in one JVM, cache-cold per
  * variant. args: dir [k] [threshold] [iters]
  * k defaults to |corpus|/128 (the constant-cell-size contract — at a
  * replicated corpus the cell count must scale with the data or the
  * within-cell sweep re-grows quadratic). Centroids are hash-seeded
  * (uniform over replicas; id-seeding would draw every seed from
  * replica 0). Prints pairs + survivors wall separately.
  * Backs: SCALE.md SemanticDedup replica rows (cell-bounded sweep scaling).
  */
object SemTime {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val k = if (args.length > 1) args(1).toInt
      else math.max(16, (n / 128).toInt)
    val threshold = if (args.length > 2) args(2).toDouble else 0.9
    val iters = if (args.length > 3) args(3).toInt else 0
    println(s"corpus=$n k=$k threshold=$threshold iters=$iters")

    graft.ops.SemanticDedup.releaseCaches()
    var t0 = System.nanoTime()
    val pairs = graft.ops.SemanticDedup.semanticPairs(emb, "vec_id",
      "embedding", threshold, k, iters, seedByHash = true).count()
    println(f"sem-pairs     ${(System.nanoTime() - t0) / 1e9}%8.2f s  pairs=$pairs")

    graft.ops.SemanticDedup.releaseCaches()
    t0 = System.nanoTime()
    val kept = graft.ops.SemanticDedup.semanticSurvivors(emb, "vec_id",
      "embedding", threshold, k, iters, seedByHash = true).count()
    println(f"sem-survivors ${(System.nanoTime() - t0) / 1e9}%8.2f s  kept=$kept")
    spark.stop()
  }
}
