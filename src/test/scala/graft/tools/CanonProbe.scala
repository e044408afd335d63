package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.GenerateExec

/** Dev tool: why doesn't exchange reuse fire on the jaccard self-join?
  * Builds the uncapped jaccard plan with broadcasts disabled, collects
  * the shuffle exchanges of the static plan, and reports which pairs are
  * canonically equal — printing the canonicalized trees of the first
  * unequal pair so the diverging node is visible. */
object CanonProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q_dedup_jaccard")(spark, sfDir)
    // unwrap AQE + recurse through cached relations to the real plan
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val q = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.inputPlan
        case other => other
      }
      q +: q.collect {
        case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          unwrap(s.relation.cachedPlan)
      }.flatten
    }
    val plans = unwrap(df.queryExecution.executedPlan)
    val plan = plans.reduceLeft((a, b) => if (a.toString.length >= b.toString.length) a else b)
    println(s"plans: ${plans.length}")
    println("=== biggest unwrapped plan ===")
    println(plan.treeString.linesIterator.take(40).mkString("\n"))
    val exchanges = plans.flatMap(_.collect { case e: ShuffleExchangeExec => e })
    println(s"shuffle exchanges: ${exchanges.length}")
    for (i <- exchanges.indices; j <- exchanges.indices if i < j) {
      val same = exchanges(i).canonicalized == exchanges(j).canonicalized
      println(s"exchange[$i] canon== exchange[$j]: $same  " +
        s"(${exchanges(i).outputPartitioning} vs ${exchanges(j).outputPartitioning})")
    }
    val gens = plans.flatMap(_.collect { case g: GenerateExec => g })
    println(s"generate nodes: ${gens.length}")
    if (gens.length >= 2) {
      println(s"generate canon equal: ${gens(0).canonicalized == gens(1).canonicalized}")
      println("--- canonicalized generate[0] ---")
      println(gens(0).canonicalized.treeString)
      println("--- canonicalized generate[1] ---")
      println(gens(1).canonicalized.treeString)
    }
    spark.stop()
  }
}
