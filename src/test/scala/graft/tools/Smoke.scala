package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: replicate the driver's t1 smoke gate —
  * `SparkEntry.entry(spark)` on sf0.001 must return rows.
  * Backs: the driver's t1 smoke gate (SparkEntry.entry rows>0).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows: $n")
    assert(n > 0, "driver smoke gate requires rows > 0")
    spark.stop()
  }
}
