package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one `SparkEntry`
  * query on a fixture dir — the `.explain("formatted")` feedback loop
  * for plan-shape iteration (broadcasts landed, filters pushed, codegen
  * spans). args: queryName [sfDir] [mode], mode ∈ formatted|extended.
  * Backs: the plan-shape iteration loop every SCALE.md plan claim cites (.explain evidence).
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "formatted"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(name)(spark, sfDir).explain(mode)
    spark.stop()
  }
}
