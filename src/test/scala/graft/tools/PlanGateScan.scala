package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run `PlanGate.violations` over every `SparkEntry.queries`
  * entry and print the offenders — the spec (`PlanGateSpec`) asserts the
  * same set stays within its allowlist. args: [sfDir].
  * Backs: PlanGateSpec's allowlist maintenance (scan offenders before editing the spec).
  */
object PlanGateScan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    var bad = 0
    names.foreach { n =>
      val vs =
        try graft.PlanGate.violations(graft.SparkEntry.queries(n)(spark, sfDir))
        catch { case e: Exception => Seq(s"EXCEPTION:${e.getClass.getSimpleName}:${e.getMessage.take(120)}") }
      if (vs.nonEmpty) { bad += 1; println(s"VIOLATION $n -> ${vs.mkString(", ")}") }
    }
    println(s"DONE ${names.length} queries, $bad with violations")
    spark.stop()
  }
}
