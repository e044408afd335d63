package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev tool: execute one `SparkEntry.queries` entry and print the FINAL
  * adaptive physical plan (post-execution), where AQE stage reuse shows
  * up as ReusedExchange/StageReuse — the static `explain` cannot show it.
  * args: queryName [sfDir].
  * Backs: SCALE.md/NOTES_r6 runtime-reuse evidence (post-execution adaptive plans).
  */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val builder = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // extra confs via env, e.g. SPARK_GRAFT_CONF="spark.sql.autoBroadcastJoinThreshold=-1;..."
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    // collect() (not count()) so THIS queryExecution runs — count() builds
    // its own execution and leaves df's adaptive plan un-executed.
    val n = df.collect().length.toLong
    val executed = df.queryExecution.executedPlan
    val finalPlan = executed match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    println(s"rows=$n")
    println(finalPlan)
    val scans = "Scan parquet".r.findAllIn(finalPlan).length
    val reused = "ReusedExchange".r.findAllIn(finalPlan).length
    println(s"SCANS=$scans REUSED_EXCHANGES=$reused")
    spark.stop()
  }
}
