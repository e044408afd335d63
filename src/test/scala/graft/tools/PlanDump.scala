package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for every `SparkEntry.queries`
  * entry (or a comma-list) into `<outDir>/<query>_<suffix>.txt` in ONE
  * JVM — the plans/r18 before/after evidence the optimization round
  * commits (ExplainQuery is one JVM per query; 200 queries need this).
  * args: outDir suffix [names.csv]
  * Backs: plans/r18/ *_before.txt / *_after.txt.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = if (args.length > 2) args(2).split(",").toSet else Set.empty[String]
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
    var fails = 0
    qs.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      } catch { case e: Throwable =>
        fails += 1
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    println(s"[plandump] wrote ${qs.size - fails}/${qs.size} plans to $outDir (suffix=$suffix)")
    spark.stop()
  }
}
