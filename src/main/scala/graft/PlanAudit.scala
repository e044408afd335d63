package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted physical plan of one or more
  * `SparkEntry.queries` entries (comma-separated in args(0)) against a
  * fixture dir (args(1), default sf0.01). Used to review shuffle counts,
  * exchange reuse, pushed filters, and codegen spans — the SCALE.md
  * claims are checked with this. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
