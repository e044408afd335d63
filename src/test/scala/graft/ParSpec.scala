package graft

import org.apache.spark.sql.functions._
import graft.ops.Par

/** Pins the r18 [[Par.widen]] contract — the parallelism-recovery helper
  * every text-amplifying build (shingle index, DSIR gram features,
  * contamination index, LM tokenize, bootstrap replicate, tf frames,
  * postings) routes its input through.
  *
  * Three load-bearing properties:
  *   1. a NARROW under-parallelized frame is widened to the session's
  *      shuffle parallelism (the measured 1-task → 32-task fix);
  *   2. a frame whose lineage contains a shuffle-inducing operator is
  *      returned UNTOUCHED — both because its layout is already at
  *      shuffle parallelism and because probing `.rdd` on it would
  *      materialize every upstream AQE query stage at call time (probed
  *      r18: widening an anti-join input ran the whole upstream pipeline
  *      eagerly, and the consuming query re-ran it);
  *   3. row multisets are bit-identical either way — widen is pure
  *      layout, invisible to the exact aggregations downstream.
  */
class ParSpec extends SparkSpec {

  private def shufflePartitions: Int =
    spark.conf.get("spark.sql.shuffle.partitions").toInt

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("widen lifts a narrow single-split frame to shuffle parallelism") {
    // the sf fixture is one small parquet file — the under-parallelized shape
    assert(docs.rdd.getNumPartitions < shufflePartitions)
    val wide = Par.widen(docs, col("doc_id"))
    assert(wide.rdd.getNumPartitions == shufflePartitions)
  }

  test("widen is identity (same object) on a shuffle-bearing lineage") {
    val agged = docs.groupBy("lang").agg(count(lit(1)).as("n"))
    assert(Par.widen(agged, col("lang")) eq agged)
    val joined = docs.as("a").join(docs.as("b"), "doc_id")
    assert(Par.widen(joined, col("doc_id")) eq joined)
  }

  test("widen is identity on a pre-repartitioned frame") {
    // a frame repartitioned at or above target must not be re-shuffled:
    // widen sees RepartitionByExpression (not narrow) and no-ops
    val preWide = docs.repartition(shufflePartitions, col("doc_id"))
    assert(Par.widen(preWide, col("doc_id")) eq preWide)
  }

  test("widen is identity when the plan carries non-deterministic expressions") {
    // the bit-identity contract cannot hold for these: an inserted
    // exchange would re-assign monotonically_increasing_id/rand values
    // relative to the unwidened plan — widen must refuse (ADVICE r18)
    val nonDet = docs.select(col("doc_id"), monotonically_increasing_id().as("mid"))
    assert(Par.widen(nonDet, col("doc_id")) eq nonDet)
    val randy = docs.select(col("doc_id"), rand(42).as("r"))
    assert(Par.widen(randy, col("doc_id")) eq randy)
  }

  test("widen preserves row multisets bit-exactly (keyed and keyless)") {
    val narrow = docs.select(col("doc_id"), col("lang"))
    val base = narrow.collect().map(_.toString).sorted.toSeq
    assert(Par.widen(narrow, col("doc_id")).collect()
      .map(_.toString).sorted.toSeq == base)
    assert(Par.widen(narrow).collect()
      .map(_.toString).sorted.toSeq == base)
  }
}
