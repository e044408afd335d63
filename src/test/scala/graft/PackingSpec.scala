package graft

import org.apache.spark.sql.functions._
import graft.ops.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  // single group (groups=1) so the next-fit walk is the full doc_id order
  private def docsDf = Seq(
    (0L, 100), (1L, 100), (2L, 100), // 0,1 -> bin 0 (200), 2 -> bin 1
    (3L, 300),                       // oversized: own bin 2
    (4L, 50), (5L, 60)               // bin 3 (110)
  ).toDF("doc_id", "n_tokens")

  test("next-fit packs in doc order, oversized docs get their own bin") {
    val out = Packing.nextFitPack(docsDf, "doc_id", col("n_tokens"), 256, 1)
      .orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("bin_id")).toMap
    assert(out === Map(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 3))
  }

  test("materializeBins concatenates bin docs in doc_id order") {
    val docs = Seq((0L, "aa bb", 2), (1L, "cc", 1), (2L, "dd ee ff", 3))
      .toDF("doc_id", "text", "n_tokens")
    val packed = Packing.nextFitPack(docs, "doc_id", col("n_tokens"), 4, 1)
    // next-fit: docs 0,1 (2+1=3 <= 4) -> bin 0; doc 2 -> bin 1
    val out = Packing.materializeBins(packed, docs, "doc_id", "text")
      .orderBy("bin_id").collect()
      .map(r => (r.getAs[Int]("bin_id"), r.getAs[String]("seq_text")))
    assert(out.toSeq == Seq((0, "aa bb cc"), (1, "dd ee ff")))
  }

  test("bin ids depend only on in-group order, not physical partitioning") {
    val shuffled = docsDf.repartition(5)
    val a = Packing.nextFitPack(docsDf, "doc_id", col("n_tokens"), 256, 1)
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = Packing.nextFitPack(shuffled, "doc_id", col("n_tokens"), 256, 1)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("empty input packs to an empty frame with the output schema") {
    val out = Packing.nextFitPack(
      docsDf.filter(col("doc_id") < 0), "doc_id", col("n_tokens"), 256, 4)
    assert(out.count() === 0)
    assert(out.columns.toSeq ===
      Seq("doc_id", "pack_group", "n_tokens", "bin_id"))
  }

  test("groups pack independently and binStats accounts every token") {
    val packed = Packing.nextFitPack(docsDf, "doc_id", col("n_tokens"), 256, 2)
    // group 0: docs 0,2,4 (100,100,50) -> one bin of 250
    // group 1: docs 1,3,5 (100,300,60) -> 100 | 300 | 60 bins
    val g0 = packed.filter(col("pack_group") === 0).select("bin_id")
      .distinct().count()
    val g1 = packed.filter(col("pack_group") === 1).select("bin_id")
      .distinct().count()
    assert(g0 === 1 && g1 === 3)
    val stats = Packing.binStats(packed, 256)
    assert(stats.agg(sum("fill")).as[Long].head() === 710L)
    val waste = stats.filter(col("pack_group") === 0).select("waste")
      .as[Long].head()
    assert(waste === 6L) // 256 - 250
  }
}
