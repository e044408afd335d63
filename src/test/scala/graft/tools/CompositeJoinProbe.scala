package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev probe (r11 VERDICT task 5): q_join_composite strategy shootout —
  * default (static BHJ), shuffle_hash, merge, and the no-join window
  * form, steady-state best-of-3. args: [sfDir].
  * Backs: NOTES_r11 composite-join strategy decision record.
  */
object CompositeJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val l = graft.model.Entities.read(spark, sfDir, "lineitem")
    l.count()
    def time(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[cjp] $name%-18s best ${ts.min}%5.2f s  (${ts.map(t => f"$t%4.2f").mkString(",")})")
    }
    def agg = l.groupBy("l_orderkey", "l_linenumber").agg(count(lit(1)).as("line_cnt"))
    def sel(df: org.apache.spark.sql.DataFrame) = df
      .select("l_orderkey", "l_linenumber", "l_partkey", "line_cnt")
      .orderBy("l_orderkey", "l_linenumber", "l_partkey")
    time("default")(sel(l.join(agg, Seq("l_orderkey", "l_linenumber"), "inner")))
    time("shuffle_hash")(sel(l.join(agg.hint("shuffle_hash"), Seq("l_orderkey", "l_linenumber"), "inner")))
    time("merge")(sel(l.join(agg.hint("merge"), Seq("l_orderkey", "l_linenumber"), "inner")))
    time("window")(sel(l.withColumn("line_cnt",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy("l_orderkey", "l_linenumber")))))
    time("no-sort default")(l.join(agg, Seq("l_orderkey", "l_linenumber"), "inner")
      .select("l_orderkey", "l_linenumber", "l_partkey", "line_cnt"))
    spark.stop()
  }
}
