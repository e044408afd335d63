package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-level timing of the DSIR weight dataflow on a fixture
  * or replica dir — isolates the gram explode/cache build from the
  * weight join so a scale regression names its stage. args: [sfDir]
  * [buckets]. Backs: the Selection one-explode/zip_with numbers in
  * NOTES_r15 / SCALE.md round-15 additions.
  */
object DsirTime {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val buckets = if (args.length > 1) args(1).toInt else 1024
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dsirtime] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.model.Entities.read(spark, sfDir, "documents")
    time("docs count")(docs.count())
    // raw gram explode volume (no cache): the scan+explode+md5 cost alone
    val tk = graft.ops.TextAnalysis.tokens(col("text"))
    val bigrams = filter(
      zip_with(tk, slice(tk, lit(2), greatest(size(tk) - 1, lit(0))),
        (x, y) => when(y.isNotNull, concat_ws(" ", x, y))),
      g => g.isNotNull)
    val grams = docs.select(col("doc_id"), explode(concat(tk, bigrams)).as("g"))
      .select(col("doc_id"),
        (conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long") % buckets).as("f"))
    time("gram explode+md5 count")(println("  grams=" + grams.count()))
    time("docf groupBy count")(
      println("  docf=" + grams.groupBy("doc_id", "f").count().count()))
    for (i <- 1 to 2)
      time(s"dsirWeights pass $i")(
        graft.ops.Selection.dsirWeights(docs, "doc_id", "text",
          col("lang") === "en", buckets).orderBy("doc_id")
          .write.format("noop").mode("overwrite").save())
    graft.ops.Selection.releaseCaches()
    spark.stop()
  }
}
