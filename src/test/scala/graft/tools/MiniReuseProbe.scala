package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Dev tool: minimal self-join exchange-reuse bisect. An exploded
  * (Generate) index self-joined on its hash column, in four combos of
  * {persisted, unpersisted} × {AQE on, AQE off}, with broadcast joins
  * disabled so the join always shuffles both sides. Prints whether the
  * executed plan shows one shared stage / ReusedExchange or two
  * independent evaluations of the same subtree.
  * Backs: SCALE.md/NOTES_r6 + protocol note: AQE runtime does NOT apply planner ReuseExchange.
  */
object MiniReuseProbe {
  def run(aqe: Boolean, cache: Boolean): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val base = spark.range(0, 1000).toDF("id")
        .withColumn("sh", array(col("id") % 7, col("id") % 11, col("id") % 13))
      val src = if (cache) base.persist() else base
      val idx = src.select(col("id"), explode(col("sh")).as("shash"))
      val joined = idx.as("a")
        .join(idx.as("b"),
          col("a.shash") === col("b.shash") && col("a.id") < col("b.id"))
        .groupBy(col("a.id")).agg(count(lit(1)))
      joined.collect()
      val executed = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      val generates = "Generate explode".r.findAllIn(executed).length
      val reusedEx = "ReusedExchange".r.findAllIn(executed).length
      val stageIds = "ShuffleQueryStage (\\d+)".r
        .findAllMatchIn(executed).map(_.group(1)).toSeq
      println(s"aqe=$aqe cache=$cache  generates=$generates " +
        s"reusedExchange=$reusedEx shuffleStages=${stageIds.mkString(",")}")
      if (cache) src.unpersist()
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    for (aqe <- Seq(true, false); cache <- Seq(true, false)) run(aqe, cache)
  }
}
