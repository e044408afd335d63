package graft

import org.apache.spark.sql.functions._
import graft.ops.Selection

class SelectionSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  // a corpus where the 'en' target speaks tokens {tq,uq,vq} and the
  // raw remainder speaks {xq,yq,zq}: DSIR must pull the target-speaking
  // candidates up and push the off-target ones down
  private def synth = Seq(
    (1L, "tq uq vq tq uq", "en"), (2L, "tq vq uq vq tq", "en"),
    (3L, "uq tq vq uq", "en"),
    (4L, "xq yq zq xq", "xx"), (5L, "yq zq xq yq zq", "xx"),
    (6L, "zq xq yq", "xx"),
    (7L, "tq uq vq", "xx"),   // target-like text, raw label
    (8L, "xq yq zq", "en")    // off-target text, target label
  ).toDF("doc_id", "text", "lang")

  test("dsirWeights pulls target-like text above off-target text") {
    val w = Selection.dsirWeights(synth, "doc_id", "text",
        col("lang") === "en", buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // doc 7 (target-sounding) must outweigh doc 4/5/6 (off-target tokens)
    assert(w(7L) > w(4L) && w(7L) > w(5L) && w(7L) > w(6L),
      s"target-like doc must score higher: $w")
    // and doc 8's off-target text scores below its target-speaking peers
    assert(w(8L) < w(1L), s"off-target text must score lower: $w")
  }

  test("dsirWeights: empty text weighs 0 with 0 grams; all docs present") {
    val withEmpty = synth.union(Seq((9L, "", "xx")).toDF("doc_id", "text", "lang"))
    val w = Selection.dsirWeights(withEmpty, "doc_id", "text",
      col("lang") === "en", buckets = 256).collect()
    assert(w.length == 9, "left-join repair keeps every doc")
    val empty = w.find(_.getLong(0) == 9L).get
    assert(empty.getLong(1) == 0L && empty.getLong(2) == 0L)
  }

  test("dsirSelectTopN returns exactly the n heaviest docs") {
    val all = Selection.dsirWeights(synth, "doc_id", "text",
        col("lang") === "en", buckets = 256)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val expect = all.sortBy { case (id, bits) => (-bits, id) }.take(3)
      .map(_._1).toSet
    val got = Selection.dsirSelectTopN(synth, "doc_id", "text",
        col("lang") === "en", n = 3, buckets = 256)
      .collect().map(_.getLong(0)).toSet
    assert(got == expect)
  }

  test("dsirGate against a persisted feature table matches dsirWeights") {
    val table = Selection.dsirFeatureTable(synth, "doc_id", "text",
      col("lang") === "en", buckets = 256)
    val w = Selection.dsirWeights(synth, "doc_id", "text",
        col("lang") === "en", buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val cut = w(7L) // everything weighing >= doc 7 passes
    val gated = Selection.dsirGate(synth, "doc_id", "text", table, cut)
      .collect().map(_.getLong(0)).toSet
    val expect = w.filter(_._2 >= cut).keySet
    assert(gated == expect, s"gate=$gated expect=$expect weights=$w")
  }

  test("dsirGate scores unseen-bucket grams through smoothing (no crash)") {
    val table = Selection.dsirFeatureTable(synth, "doc_id", "text",
      col("lang") === "en", buckets = 256)
    // entirely new vocabulary: every gram may miss the table
    val fresh = Seq((100L, "wq oq pq")).toDF("doc_id", "text")
    val out = Selection.dsirGate(fresh, "doc_id", "text", table,
      minBits = Long.MinValue)
    assert(out.count() == 1)
  }

  test("dsirIndexFrame + dsirWeightsFromIndex == dsirWeights, bit for bit " +
    "(the persisted-index equivalence, r17)") {
    val direct = Selection.dsirWeights(synth, "doc_id", "text",
      col("lang") === "en", buckets = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    // round-trip through parquet like a real deployment would
    val path = java.nio.file.Files.createTempDirectory("dsir-idx").toString
    Selection.dsirIndexFrame(synth, "doc_id", "text",
      col("lang") === "en", buckets = 64).write.mode("overwrite").parquet(path)
    val reloaded = spark.read.parquet(path)
    val indexed = Selection.dsirWeightsFromIndex(reloaded,
      synth.select("doc_id"), "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(indexed == direct)
    // zero-gram repair still rides docIds, not the index: a doc id absent
    // from the index (no grams) must still report (0, 0)
    val extra = Selection.dsirWeightsFromIndex(reloaded,
      Seq(1L, 99L).toDF("doc_id"), "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(extra.exists(_ == (99L, 0L, 0L)))
  }

  test("dsirSelectTopNFromIndex == dsirSelectTopN through a parquet " +
    "round-trip (the last DSIR family member indexed, r18)") {
    val direct = Selection.dsirSelectTopN(synth, "doc_id", "text",
      col("lang") === "en", n = 3, buckets = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val path = java.nio.file.Files.createTempDirectory("dsir-idx-topn").toString
    Selection.dsirIndexFrame(synth, "doc_id", "text",
      col("lang") === "en", buckets = 64).write.mode("overwrite").parquet(path)
    val indexed = Selection.dsirSelectTopNFromIndex(
      spark.read.parquet(path), synth.select("doc_id"), "doc_id", n = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(indexed == direct)
    assert(indexed.size == 3)
  }

  test("dsirWeightsFromIndex fails loudly on an empty/NULL-arity index") {
    val empty = spark.emptyDataFrame
      .withColumn("doc_id", lit(0L)).withColumn("is_target", lit(true))
      .withColumn("f", lit(0L)).withColumn("c", lit(0L))
      .withColumn("n_buckets", lit(0L)).filter(lit(false))
    val ex = intercept[IllegalArgumentException] {
      Selection.dsirWeightsFromIndex(empty, synth.select("doc_id"), "doc_id")
    }
    assert(ex.getMessage.contains("dsirIndexFrame"))
  }

  test("buckets bound is enforced") {
    val ex = intercept[IllegalArgumentException] {
      Selection.dsirWeights(synth, "doc_id", "text",
        col("lang") === "en", buckets = 0)
    }
    assert(ex.getMessage.contains("buckets"))
  }

  test("fixture run is deterministic and fully integer-typed") {
    def run() = Selection.dsirWeights(docs, "doc_id", "text",
        col("lang") === "en", buckets = 1024)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val a = run()
    assert(a == run())
    assert(a.nonEmpty && a.exists(_._3 != 0L), "weights must discriminate")
  }
}
