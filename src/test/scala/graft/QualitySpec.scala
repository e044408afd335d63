package graft

import org.apache.spark.sql.functions._
import graft.ops.{DuplicateException, Quality}

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("gate passes a clean primary key and returns the frame unchanged") {
    val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
    val out = Quality.gate(df, Seq("id"))
    assert(out.collect().toSet == df.collect().toSet)
  }

  test("gate throws DuplicateException on any duplicated key") {
    val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("id", "v")
    assertThrows[DuplicateException](Quality.gate(df, Seq("id")))
  }

  test("composite keys: duplicate only when all key parts repeat") {
    val df = Seq((1, "x", "a"), (1, "y", "b"), (2, "x", "c")).toDF("k1", "k2", "v")
    Quality.gate(df, Seq("k1", "k2")) // clean
    val dup = df.union(Seq((1, "x", "z")).toDF("k1", "k2", "v"))
    assertThrows[DuplicateException](Quality.gate(dup, Seq("k1", "k2")))
  }

  test("duplicates reports the offending groups with counts") {
    val df = Seq((1, "a"), (1, "b"), (1, "c"), (2, "d")).toDF("id", "v")
    val dups = Quality.duplicates(df, Seq("id")).collect()
    assert(dups.length == 1)
    assert(dups.head.getAs[Long]("cnt") == 3L)
  }

  test("orders fixture is clean on o_orderkey; lineitem is dirty on l_orderkey") {
    val o = graft.model.Entities.read(spark, sf, "orders")
    Quality.gate(o, Seq("o_orderkey"))
    val li = graft.model.Entities.read(spark, sf, "lineitem")
    assert(!Quality.duplicates(li, Seq("l_orderkey")).isEmpty)
  }

  test("filterFunnel reports cumulative survivors per stage") {
    val df = Seq((1L, 10L, true, true), (2L, 20L, true, false),
      (3L, 30L, false, true), (4L, 40L, true, true))
      .toDF("id", "w", "a", "b")
    val out = Quality.filterFunnel(df,
      Seq("stage_a" -> col("a"), "stage_b" -> col("b")), col("w"))
      .orderBy("stage_idx").collect()
    assert(out.map(_.getAs[String]("stage")).toSeq ==
      Seq("all_rows", "stage_a", "stage_b"))
    // baseline: 4 rows, weight 100, 10000 bp
    assert(out(0).getAs[Long]("n_rows") == 4L)
    assert(out(0).getAs[Long]("total_weight") == 100L)
    assert(out(0).getAs[Long]("rows_bp") == 10000L)
    // stage_a: rows 1,2,4 (w 70); stage_b CUMULATIVE: rows 1,4 (w 50) —
    // row 3 passes b but already failed a
    assert(out(1).getAs[Long]("n_rows") == 3L)
    assert(out(1).getAs[Long]("total_weight") == 70L)
    assert(out(1).getAs[Long]("rows_bp") == 7500L)
    assert(out(2).getAs[Long]("n_rows") == 2L)
    assert(out(2).getAs[Long]("total_weight") == 50L)
    assert(out(2).getAs[Long]("rows_bp") == 5000L)
  }

  test("filterFunnel on empty input yields zero counts and NULL shares") {
    val df = Seq.empty[(Long, Long)].toDF("id", "w")
    val out = Quality.filterFunnel(df, Seq("pos" -> (col("w") > 0L)), col("w"))
      .orderBy("stage_idx").collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[Long]("n_rows") == 0L))
    assert(out.forall(_.getAs[Long]("total_weight") == 0L))
    assert(out.forall(_.isNullAt(out.head.fieldIndex("rows_bp"))))
  }

  test("filterFunnel rejects stage names that could inject into the " +
    "stack() SQL literal") {
    val df = Seq((1L, 10L, true)).toDF("id", "w", "a")
    for (bad <- Seq("bad'name", "bad\\name", "bad name", "bad,name", ""))
      assertThrows[IllegalArgumentException] {
        Quality.filterFunnel(df, Seq(bad -> col("a")), col("w"))
      }
    for (bad <- Seq("x'y", "")) // same guard on the grouped form
      assertThrows[IllegalArgumentException] {
        Quality.filterFunnelBy(df, "id", Seq(bad -> col("a")), col("w"))
      }
    // identifier-class names still work
    assert(Quality.filterFunnel(df,
      Seq("Stage_1" -> col("a")), col("w")).count() == 2L)
  }

  test("filterFunnelBy keys the funnel per group; shares are within-group") {
    val df = Seq(
      ("A", 10L, true), ("A", 20L, true), ("A", 30L, false), ("A", 40L, true),
      ("B", 5L, false), ("B", 7L, false)
    ).toDF("src", "w", "ok")
    val out = Quality.filterFunnelBy(df, "src",
      Seq("ok" -> col("ok")), col("w"))
      .collect().map(r => (r.getAs[String]("src"), r.getAs[Long]("stage_idx")) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("total_weight"),
          r.getAs[Long]("rows_bp"))).toMap
    assert(out.size == 4) // 2 groups × (baseline + 1 stage)
    assert(out(("A", 0L)) == ((4L, 100L, 10000L)))
    assert(out(("A", 1L)) == ((3L, 70L, 7500L)))
    assert(out(("B", 0L)) == ((2L, 12L, 10000L)))
    assert(out(("B", 1L)) == ((0L, 0L, 0L))) // all-fail group still reports
  }

  test("filterFunnelBy matches filterFunnel run per group") {
    val d = graft.model.Entities.read(spark, sf, "documents")
    val n = length(coalesce(col("text"), lit(""))).cast("long")
    val stages = Seq("len_ge_100" -> (n >= 100L), "lang_en" -> (col("lang") === "en"))
    val grouped = Quality.filterFunnelBy(d, "source", stages, n)
    val sources = d.select("source").distinct().collect().map(_.getString(0))
    sources.foreach { src =>
      val single = Quality.filterFunnel(
        d.filter(col("source") <=> src), stages, n)
      val slice = grouped.filter(col("source") <=> src)
        .drop("source")
      assert(slice.exceptAll(single).isEmpty && single.exceptAll(slice).isEmpty,
        s"group $src diverges")
    }
  }

  test("filterFunnel equals sequential filters on randomized stages") {
    for (seed <- Seq(7, 21, 63)) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.fill(150)((rnd.nextInt(100).toLong,
        rnd.nextBoolean(), rnd.nextBoolean(), rnd.nextBoolean()))
      val df = rows.toDF("w", "a", "b", "c")
      val stages = Seq("a" -> col("a"), "b" -> col("b"), "c" -> col("c"))
      val out = Quality.filterFunnel(df, stages, col("w"))
        .orderBy("stage_idx").collect()
      // reference: apply the prefix of predicates directly
      val preds = Seq[((Long, Boolean, Boolean, Boolean)) => Boolean](
        _ => true, _._2, r => r._2 && r._3, r => r._2 && r._3 && r._4)
      preds.zipWithIndex.foreach { case (p, i) =>
        val kept = rows.filter(p)
        assert(out(i).getAs[Long]("n_rows") == kept.size.toLong,
          s"seed $seed stage $i rows")
        assert(out(i).getAs[Long]("total_weight") == kept.map(_._1).sum,
          s"seed $seed stage $i weight")
        assert(out(i).getAs[Long]("rows_bp") ==
          kept.size.toLong * 10000L / rows.size, s"seed $seed stage $i bp")
      }
    }
  }

  test("filterFunnel survivor counts are monotone non-increasing") {
    val d = graft.model.Entities.read(spark, sf, "documents")
    val n = length(coalesce(col("text"), lit(""))).cast("long")
    val out = Quality.filterFunnel(d, Seq(
      "len_ge_100" -> (n >= 100L),
      "len_ge_300" -> (n >= 300L),
      "lang_en" -> (col("lang") === "en")), n)
      .orderBy("stage_idx").collect()
    val counts = out.map(_.getAs[Long]("n_rows")).toSeq
    assert(counts == counts.sorted.reverse, s"not monotone: $counts")
    assert(counts.head == d.count())
  }
}
