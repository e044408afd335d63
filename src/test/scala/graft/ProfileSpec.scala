package graft

import org.apache.spark.sql.functions._
import graft.ops.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile stats match direct queries on the fixture") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = Profile.profile(docs, Seq("doc_id", "lang", "n_chars"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("doc_id", "lang", "n_chars"))
    val n = docs.count()
    val langRow = p("lang")
    assert(langRow.getAs[Long]("n_rows") == n)
    assert(langRow.getAs[Long]("n_null") == 0L)
    assert(langRow.getAs[Long]("n_distinct") ==
      docs.select("lang").distinct().count())
    assert(langRow.getAs[String]("min_s") ==
      docs.agg(min("lang")).first().getString(0))
  }

  test("null accounting: n_null counts, distinct excludes nulls") {
    val df = Seq(Some(1L), None, Some(2L), Some(2L), None)
      .toDF("v")
    val r = Profile.profile(df, Seq("v")).first()
    assert(r.getAs[Long]("n_rows") == 5L)
    assert(r.getAs[Long]("n_null") == 2L)
    assert(r.getAs[Long]("n_distinct") == 2L)
    assert(r.getAs[String]("min_s") == "1" && r.getAs[String]("max_s") == "2")
  }

  test("one aggregation job profiles all columns (tall from one row)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Profile.profile(docs, Seq("doc_id", "lang", "source", "n_chars"))
    assert(out.count() == 4)
  }
}
