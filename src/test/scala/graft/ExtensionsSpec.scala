package graft

import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions equal the Column API") {
    GraftExtensions.register(spark)
    Seq(("the quick brown fox", 1L)).toDF("text", "id")
      .createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT simhash64(text) AS h, shingle_hashes(text, 3) AS sh FROM ext_docs")
      .first()
    val viaCol = Seq(("the quick brown fox", 1L)).toDF("text", "id")
      .select(
        graft.functions.SimHash64.simhash64($"text").as("h"),
        graft.functions.ShingleHashes.shingleHashes($"text", 3).as("sh"))
      .first()
    assert(viaSql.getLong(0) == viaCol.getLong(0))
    assert(viaSql.getSeq[Long](1) == viaCol.getSeq[Long](1))
  }

  test("dot_product in SQL matches VectorOps.dot") {
    GraftExtensions.register(spark)
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    df.createOrReplaceTempView("ext_vecs")
    val viaSql = spark.sql("SELECT dot_product(a, b) FROM ext_vecs").first().getDouble(0)
    val viaCol = df.select(graft.functions.VectorOps.dot($"a", $"b")).first().getDouble(0)
    assert(viaSql == 11.0 && viaCol == 11.0)
  }

  test("dot_product and l2_sq throw loudly on ragged arrays (ADVICE r15)") {
    // truncating would silently diverge from the DuckDB oracle's
    // NULL-padding list_zip; a length mismatch must be a loud data bug
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val eDot = intercept[Exception] {
      df.select(graft.functions.VectorOps.dot($"a", $"b")).collect()
    }
    val eL2 = intercept[Exception] {
      df.select(graft.functions.VectorOps.l2sq($"a", $"b")).collect()
    }
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null) c = c.getCause
      c.getMessage
    }
    assert(rootMsg(eDot).contains("ragged arrays (3 vs 2"))
    assert(rootMsg(eL2).contains("ragged arrays (3 vs 2"))
  }

  test("min_gram_hash64 in SQL matches the Column API") {
    GraftExtensions.register(spark)
    val df = Seq(Tuple1("long enough text here")).toDF("text")
    df.createOrReplaceTempView("ext_mgh")
    val viaSql = spark.sql("SELECT min_gram_hash64(text, 8) FROM ext_mgh")
      .first().getLong(0)
    val viaCol = df.select(graft.ops.TextAnalysis.minGramFingerprint($"text", 8))
      .first().getLong(0)
    assert(viaSql == viaCol)
  }

  test("hyperplane_buckets in SQL matches the Column API") {
    GraftExtensions.register(spark)
    val df = Seq(Tuple1(Array.tabulate(64)(i => (i % 7 - 3).toFloat))).toDF("v")
    df.createOrReplaceTempView("ext_hpb")
    val viaSql = spark.sql("SELECT hyperplane_buckets(v, 16, 8, 64) FROM ext_hpb")
      .first().getSeq[Int](0)
    val viaCol = df.select(graft.functions.HyperplaneBuckets
        .hyperplaneBuckets($"v", 16, 8, 64))
      .first().getSeq[Int](0)
    assert(viaSql == viaCol && viaSql.length == 16)
  }

  test("non-literal n for shingle_hashes is rejected") {
    GraftExtensions.register(spark)
    Seq(("a b c", 3)).toDF("text", "n").createOrReplaceTempView("ext_bad")
    intercept[Exception] {
      spark.sql("SELECT shingle_hashes(text, n) FROM ext_bad").collect()
    }
  }

  test("sum128 / sortable_double_bits / string_ord_longs in SQL match " +
    "the Column/expression APIs") {
    GraftExtensions.register(spark)
    Seq((1L, 2.5, "abc"), (Long.MaxValue / 2, -0.0, "ab"),
      (Long.MaxValue / 2, 1.5, "b"))
      .toDF("v", "d", "s").createOrReplaceTempView("ext_new")
    val viaSql = spark.sql(
      "SELECT sum128(v) FROM ext_new").first().getDecimal(0)
    val viaCol = spark.table("ext_new")
      .agg(graft.functions.Sum128.sum128($"v")).first().getDecimal(0)
    assert(viaSql.compareTo(viaCol) == 0)
    val bitsSql = spark.sql(
      "SELECT sortable_double_bits(d) FROM ext_new ORDER BY v, d")
      .collect().map(_.getLong(0)).toSeq
    val bitsCol = spark.table("ext_new").orderBy("v", "d")
      .select(graft.functions.SortableDoubleBits.sortableDoubleBits($"d"))
      .collect().map(_.getLong(0)).toSeq
    assert(bitsSql == bitsCol)
    val ordSql = spark.sql(
      "SELECT string_ord_longs(s, 2, true) FROM ext_new WHERE s = 'abc'")
      .first().getSeq[Long](0)
    val ordCol = spark.table("ext_new").filter($"s" === "abc")
      .select(graft.functions.StringOrdLongs.stringOrdAsc($"s", 2))
      .first().getSeq[Long](0)
    assert(ordSql == ordCol)
  }
}
