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

  test("approxDistinct: estimates inside the rsd bound, no Expand in the plan") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val cols = Seq("doc_id", "lang", "n_chars")
    val exact = Profile.profile(docs, cols)
      .collect().map(r => r.getString(0) -> r).toMap
    val rsd = 0.05
    val approx = Profile.profile(docs, cols, approxDistinct = true, rsd = rsd)
      .collect().map(r => r.getString(0) -> r).toMap
    cols.foreach { c =>
      val (e, a) = (exact(c), approx(c))
      // everything except n_distinct stays exact
      assert(a.getAs[Long]("n_rows") == e.getAs[Long]("n_rows"))
      assert(a.getAs[Long]("n_null") == e.getAs[Long]("n_null"))
      assert(a.getAs[String]("min_s") == e.getAs[String]("min_s"))
      assert(a.getAs[String]("max_s") == e.getAs[String]("max_s"))
      // HLL++ estimate within 4*rsd of exact (±2 rsd covers ~95%; 4 is
      // a deterministic-fixture margin, the sketch is seedless-stable)
      val (ed, ad) = (e.getAs[Long]("n_distinct").toDouble,
        a.getAs[Long]("n_distinct").toDouble)
      assert(math.abs(ad - ed) <= math.max(1.0, 4 * rsd * ed),
        s"$c: approx $ad vs exact $ed")
    }
    // the point of the opt-in: the one-pass plan has NO Expand node
    val plan = Profile.profile(docs, cols, approxDistinct = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "approx profile must not plan an Expand")
    assert(Profile.profile(docs, cols).queryExecution.executedPlan
      .toString.contains("Expand"), "exact multi-distinct profile plans Expand")
  }
  test("profileBy slices stats per group; totals reconcile with global") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val by = Profile.profileBy(docs, "lang", Seq("doc_id", "n_chars"))
      .collect()
    val langs = docs.select("lang").distinct().count()
    assert(by.length == langs * 2)
    // per-group n_rows sum to the corpus size for every column
    val totals = by.groupBy(_.getAs[String]("col_name"))
      .view.mapValues(_.map(_.getAs[Long]("n_rows")).sum).toMap
    assert(totals.values.forall(_ == docs.count()))
    // spot-check one group against a direct query
    val en = by.filter(r => r.getString(0) == "en" &&
      r.getAs[String]("col_name") == "n_chars").head
    val want = docs.filter(col("lang") === "en")
      .agg(count(lit(1)), countDistinct("n_chars"),
        min("n_chars").cast("string"), max("n_chars").cast("string")).head()
    assert(en.getAs[Long]("n_rows") == want.getLong(0))
    assert(en.getAs[Long]("n_distinct") == want.getLong(1))
    assert(en.getAs[String]("min_s") == want.getString(2))
    assert(en.getAs[String]("max_s") == want.getString(3))
  }
}
