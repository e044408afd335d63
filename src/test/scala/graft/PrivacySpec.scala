package graft

import org.apache.spark.sql.functions._
import graft.ops.Privacy

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, Option("en"), Option("web")),  // en/web ×3 → kept at k=3
    (2L, Option("en"), Option("web")),
    (3L, Option("en"), Option("web")),
    (4L, Option("en"), Option("book")), // singleton → suppressed
    (5L, Option("de"), Option("web")),  // de/web ×2 → suppressed at k=3
    (6L, Option("de"), Option("web")),
    (7L, None, None),                   // all-NULL quasi ×3 → kept at k=3
    (8L, None, None),
    (9L, None, None)
  ).toDF("id", "lang", "src")

  test("groups of size >= k keep their quasi values; smaller ones mask") {
    val out = Privacy.kAnonymize(rows, "id", Seq("lang", "src"), k = 3L)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("lang_g"), r.getAs[String]("src_g"),
          r.getAs[Long]("group_n"), r.getAs[Boolean]("kept"))).toMap
    assert(out(1L) == (("en", "web", 3L, true)))
    assert(out(4L) == (("*", "*", 1L, false)))
    assert(out(5L) == (("*", "*", 2L, false)))
    assert(out(6L) == (("*", "*", 2L, false)))
  }

  test("NULL quasi combinations form their own group (null-safe join)") {
    val out = Privacy.kAnonymize(rows, "id", Seq("lang", "src"), k = 3L)
    // every input row survives the group join exactly once, NULLs included
    assert(out.count() == 9L)
    val nullGroup = out.filter(col("id") >= 7L).collect()
    assert(nullGroup.forall(_.getAs[Long]("group_n") == 3L))
    assert(nullGroup.forall(_.getAs[Boolean]("kept")))
    // a kept NULL stays NULL — masking only rewrites small groups
    assert(nullGroup.forall(r => r.getAs[String]("lang_g") == null))
  }

  test("k=1 keeps everything; large k suppresses everything") {
    val all = Privacy.kAnonymize(rows, "id", Seq("lang", "src"), k = 1L)
    assert(all.filter(!col("kept")).isEmpty)
    val none = Privacy.kAnonymize(rows, "id", Seq("lang", "src"), k = 10L)
    assert(none.filter(col("kept")).isEmpty)
  }

  test("single quasi column groups independently of the other") {
    val out = Privacy.kAnonymize(rows, "id", Seq("lang"), k = 4L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("kept")).toMap
    // en ×4 kept, de ×2 suppressed, NULL ×3 suppressed
    assert(out(1L) && out(4L))
    assert(!out(5L) && !out(7L))
  }

  test("lDiversity counts DISTINCT sensitive values, NULLs excluded") {
    val df = Seq(
      ("en", Option("web")), ("en", Option("web")), ("en", Option("book")),
      ("de", Option("web")), ("de", None),
      ("fr", None)
    ).toDF("lang", "src")
    val out = Privacy.lDiversity(df, Seq("lang"), "src", l = 2L)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("group_n"), r.getAs[Long]("n_sensitive"),
          r.getAs[Boolean]("diverse"))).toMap
    // en: 3 rows, 2 distinct sources → diverse
    assert(out("en") == ((3L, 2L, true)))
    // de: 2 rows but only 1 non-NULL source → NOT diverse despite size
    assert(out("de") == ((2L, 1L, false)))
    // fr: all-NULL sensitive → zero diversity
    assert(out("fr") == ((1L, 0L, false)))
  }

  test("lDiversity flags a large homogeneous group k-anonymity would pass") {
    val df = (1L to 50L).map(i => (i, "en", "web")).toDF("id", "lang", "src")
    val kanon = Privacy.kAnonymize(df, "id", Seq("lang"), k = 10L)
    assert(kanon.filter(!col("kept")).isEmpty) // size-50 group: k-anon passes
    val ldiv = Privacy.lDiversity(df, Seq("lang"), "src", l = 2L).collect()
    assert(ldiv.length == 1 && !ldiv.head.getAs[Boolean]("diverse"))
  }

  test("kAnonymizeAgainst an index equals kAnonymize over the union") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"),
        expr("n_chars div 200").as("band"))
    val corpus = d.filter(col("doc_id") % 10 =!= 1)
    val batch = d.filter(col("doc_id") % 10 === 1)
    val q = Seq("lang", "source", "band")
    val incr = Privacy.kAnonymizeAgainst(batch,
      Privacy.buildQuasiIndex(corpus, q), "doc_id", q, k = 4L)
    val full = Privacy.kAnonymize(d, "doc_id", q, k = 4L)
      .filter(col("doc_id") % 10 === 1)
    assert(incr.count() == batch.count())
    assert(incr.exceptAll(full).isEmpty && full.exceptAll(incr).isEmpty)
  }

  test("kAnonymizeAgainst: a combination absent from the index counts 0") {
    val corpus = Seq((1L, "en"), (2L, "en"), (3L, "en")).toDF("id", "lang")
    val batch = Seq((10L, "en"), (11L, "de"), (12L, "de")).toDF("id", "lang")
    val out = Privacy.kAnonymizeAgainst(batch,
      Privacy.buildQuasiIndex(corpus, Seq("lang")), "id", Seq("lang"), k = 4L)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("group_n"), r.getAs[Boolean]("kept"))).toMap
    assert(out(10L) == ((4L, true)))  // 3 corpus + 1 batch
    assert(out(11L) == ((2L, false))) // absent from index: batch-only size
    assert(out(12L) == ((2L, false)))
  }

  test("tCloseness matches the hand-computed TVD in basis points") {
    // A: 4 rows (3 web, 1 book); B: 6 rows (3 web, 3 book).
    // Global: web 6, book 4, N 10.
    // TVD_A = ½(|3/4−6/10| + |1/4−4/10|) = 0.15 → 1500 bp
    // TVD_B = ½(|3/6−6/10| + |3/6−4/10|) = 0.10 → 1000 bp
    val df = (Seq.fill(3)(("A", "web")) ++ Seq(("A", "book")) ++
      Seq.fill(3)(("B", "web")) ++ Seq.fill(3)(("B", "book")))
      .toDF("g", "src")
    val out = Privacy.tCloseness(df, Seq("g"), "src", tBp = 1200L)
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("group_n"), r.getAs[Long]("tvd_bp"),
          r.getAs[Boolean]("close"))).toMap
    assert(out("A") == ((4L, 1500L, false)))
    assert(out("B") == ((6L, 1000L, true)))
  }

  test("tCloseness charges categories absent from a group (closed form)") {
    // A: 2 rows, all web; B: 1 web + 1 book. Global web 3, book 1, N 4.
    // TVD_A = ½(|2/2−3/4| + |0/2−1/4|) = 0.25 → 2500 bp — the book
    // term exists only through the absent-category fold
    val df = Seq(("A", "web"), ("A", "web"), ("B", "web"), ("B", "book"))
      .toDF("g", "src")
    val out = Privacy.tCloseness(df, Seq("g"), "src", tBp = 2500L)
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("tvd_bp"), r.getAs[Boolean]("close"))).toMap
    assert(out("A") == ((2500L, true)))
  }

  test("tCloseness buckets NULL sensitive values as their own category") {
    // A: 2 NULL; B: 2 web. Global: NULL 2, web 2, N 4.
    // Each group is fully concentrated on one of two half-mass
    // categories → TVD = ½(|1−½| + |0−½|) = ½ → 5000 bp both
    val df = Seq(("A", Option.empty[String]), ("A", Option.empty[String]),
      ("B", Option("web")), ("B", Option("web"))).toDF("g", "src")
    val out = Privacy.tCloseness(df, Seq("g"), "src", tBp = 4999L)
      .collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[Long]("tvd_bp") == 5000L))
    assert(out.forall(!_.getAs[Boolean]("close")))
  }

  test("tCloseness: a group mirroring the global mix sits at 0 bp") {
    val df = Seq(("A", "web"), ("A", "book"), ("B", "web"), ("B", "book"))
      .toDF("g", "src")
    val out = Privacy.tCloseness(df, Seq("g"), "src", tBp = 0L).collect()
    assert(out.forall(_.getAs[Long]("tvd_bp") == 0L))
    assert(out.forall(_.getAs[Boolean]("close")))
  }

  test("tCloseness buckets NULL quasi values as their own group") {
    val df = Seq((Option.empty[String], "web"), (Option.empty[String], "web"),
      (Option("A"), "book")).toDF("g", "src")
    val out = Privacy.tCloseness(df, Seq("g"), "src", tBp = 10000L).collect()
    assert(out.length == 2)
    val nullRow = out.find(_.isNullAt(0)).get
    assert(nullRow.getAs[Long]("group_n") == 2L)
  }

  test("tCloseness is repartition-invariant (exact decimal sums)") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), col("source"), expr("n_chars div 200").as("band"))
    val a = Privacy.tCloseness(d, Seq("lang", "band"), "source", 2000L)
    val b = Privacy.tCloseness(d.repartition(7), Seq("lang", "band"),
      "source", 2000L)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("tCloseness matches a plain-Scala BigInt reference on random data") {
    for (seed <- Seq(11, 42, 99)) {
      val rnd = new scala.util.Random(seed)
      val groups = Array("A", "B", "C", null)
      val cats = Array("w", "x", "y", null)
      val rows = Seq.fill(200)((groups(rnd.nextInt(groups.length)),
        cats(rnd.nextInt(cats.length))))
      // reference: exact integer TVD over ALL categories per group
      val n = BigInt(rows.size)
      val catTot = rows.groupBy(_._2).map { case (c, rs) => c -> BigInt(rs.size) }
      val expected = rows.groupBy(_._1).map { case (g, rs) =>
        val ng = BigInt(rs.size)
        val cellOf = rs.groupBy(_._2).map { case (c, xs) => c -> BigInt(xs.size) }
        val num = catTot.map { case (c, cs) =>
          (cellOf.getOrElse(c, BigInt(0)) * n - cs * ng).abs
        }.sum
        g -> (num * 10000 / (2 * ng * n)) // positive ⇒ / == div == //
      }
      val df = rows.toDF("g", "src")
      val out = Privacy.tCloseness(df, Seq("g"), "src", tBp = 10000L)
        .collect().map(r => Option(r.getAs[String]("g")).orNull ->
          r.getAs[Long]("tvd_bp")).toMap
      assert(out.keySet == expected.keySet, s"seed $seed")
      expected.foreach { case (g, e) =>
        assert(BigInt(out(g)) == e, s"seed $seed group $g: ${out(g)} != $e")
      }
    }
  }
}
