package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: micro-bench Spark's full-table levenshtein vs the banded
  * expression on n pseudo-random string pairs of the linkage shape
  * (~40 chars, distance mostly far beyond the band — the verify
  * worst case). args: [nPairs] [len] [maxDist]. */
object LevTime {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val len = if (args.length > 1) args(1).toInt else 40
    val k = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(n).select(
      substring(repeat(md5(concat(col("id"), lit("a"))), (len / 32) + 1), 1, len).as("a"),
      substring(repeat(md5(concat(col("id"), lit("b"))), (len / 32) + 1), 1, len).as("b"))
      .persist()
    df.count()
    def time(tag: String)(c: org.apache.spark.sql.Column): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val s = df.select(sum(c)).head().getLong(0)
        println(f"$tag%-8s run$i: ${(System.nanoTime() - t0) / 1e9}%6.2f s  (sum=$s)")
      }
    time("full")(levenshtein(col("a"), col("b")).cast("long"))
    time("banded")(least(graft.functions.BandedLevenshtein
      .bandedLevenshtein(col("a"), col("b"), k), lit(k + 1)).cast("long"))
    spark.stop()
  }
}
