package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Quantiles

/** Dev tool: A/B the seeded vs unseeded grouped double-quantile
  * protocol on the outlier (median → MAD) shape at replica scale —
  * the measurement behind `groupedExactQuantileDouble`'s seeded
  * default. Alternates variants to cancel warmup drift.
  *
  * Usage: runMain graft.tools.SeedTime [eventsDir] [reps=2]
  * Backs: SCALE.md seeded grouped-quantile default measurement.
  */
object SeedTime {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/x100s3"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$dir/events.parquet")
    e.count() // session warmup outside the timed region

    def madProtocol(seeded: Boolean): Double = {
      val t0 = System.nanoTime()
      val med = Quantiles
        .groupedExactQuantileDouble(e, "event_type", "value", 0.5, seeded = seeded)
        .withColumnRenamed("value", "med").withColumnRenamed("event_type", "__g")
      val withMed = e.join(broadcast(med), col("event_type") <=> col("__g"))
        .drop("__g")
        .withColumn("dev", abs(col("value").cast("double") - col("med")))
      Quantiles
        .groupedExactQuantileDouble(withMed, "event_type", "dev", 0.5,
          seeded = seeded)
        .count()
      (System.nanoTime() - t0) / 1e9
    }

    val results = (1 to reps).flatMap { _ =>
      Seq(true -> madProtocol(seeded = true),
        false -> madProtocol(seeded = false))
    }
    results.groupBy(_._1).toSeq.sortBy(!_._1).foreach { case (s, ts) =>
      val best = ts.map(_._2).min
      println(f"[seedtime] seeded=$s%-5s best=${best}%.2f s " +
        f"(all: ${ts.map(t => f"${t._2}%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
