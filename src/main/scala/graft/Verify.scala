package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // fixture-flavor tolerance: a TIMESTAMP(NANOS) events fixture reads
      // as long nanos (EventStreams.normalizeTs converts to micros); the
      // current naive-micros fixture reads as TIMESTAMP_NTZ and needs
      // neither conf nor conversion
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev-only subset filter, mirroring Bench (full run when unset — the
    // driver never sets it). LOUD when active, plus an on-disk sentinel:
    // a leaked env var must not let a narrowed dump read as a clean full
    // run (absent outputs would look like a smaller green suite).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    only.foreach { names =>
      val skipped = SparkEntry.queries.size - names.size
      System.err.println(
        s"[verify] *** SPARK_GRAFT_ONLY ACTIVE: dumping ${names.size} of " +
          s"${SparkEntry.queries.size} queries ($skipped SKIPPED) — " +
          "NOT a full verification run ***")
      Files.writeString(Paths.get(s"$outDir/_PARTIAL_RUN"),
        s"SPARK_GRAFT_ONLY=${names.toSeq.sorted.mkString(",")}\n" +
          s"skipped=$skipped\n")
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // JSON string escape lives in OracleJson (shared with Bench's
    // same-window duck pairing) — a tab or CR in builder-authored SQL
    // would otherwise make the driver's json.load fail and silently
    // zero the round's correctness.
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      OracleJson.dump(SparkEntry.oracleSql))
    spark.stop()
  }
}
