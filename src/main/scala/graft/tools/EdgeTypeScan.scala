package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, DecimalType, DoubleType, FloatType, StructType, ArrayType, MapType, StructField}

/** Dev probe: inventory of queries whose OUTPUT schema carries
  * hash-fragile types (float/double/decimal) — the r8 driver-hash
  * divergence class. Schema-only (no jobs). */
object EdgeTypeScan {
  def fragile(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType => true
    case _: DecimalType         => true
    case ArrayType(e, _)        => fragile(e)
    case MapType(k, v, _)       => fragile(k) || fragile(v)
    case s: StructType          => s.fields.exists(f => fragile(f.dataType))
    case _                      => false
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val cols = fn(spark, sf).schema.fields.collect {
          case StructField(n, dt, _, _) if fragile(dt) => s"$n:${dt.simpleString}"
        }
        if (cols.nonEmpty) println(s"$name  ${cols.mkString(", ")}")
      } catch { case e: Throwable => println(s"$name  ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}
