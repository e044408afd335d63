package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Eval, Similarity}

class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("recallAtK counts per-query hits against the exact side") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "nn_id")
    // q1 finds 2 of 3; q2 finds none (one spurious neighbor ignored)
    val approx = Seq((1L, 10L), (1L, 12L), (1L, 99L), (3L, 30L))
      .toDF("query_id", "nn_id")
    val out = Eval.recallAtK(exact, approx, "query_id", "nn_id")
      .collect().map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("n_exact"), r.getAs[Long]("n_hits"),
          r.getAs[Long]("recall_bp"))).toMap
    assert(out.keySet == Set(1L, 2L)) // exact side drives; q3 is noise
    assert(out(1L) == ((3L, 2L, 6666L)))
    assert(out(2L) == ((2L, 0L, 0L)))
  }

  test("recallAtK is 10000 bp everywhere when approx equals exact") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5L)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
    val out = Eval.recallAtK(exact, exact, "query_id", "nn_id")
    assert(out.filter(col("recall_bp") =!= 10000L).isEmpty)
    assert(out.count() == 5L)
  }

  test("pairConfusion computes the hand confusion row") {
    val truth = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_i", "doc_j")
    val pred = Seq((1L, 2L), (4L, 5L)).toDF("doc_i", "doc_j")
    val r = Eval.pairConfusion(truth, pred, "doc_i", "doc_j").collect().head
    assert(r.getAs[Long]("n_truth") == 3L && r.getAs[Long]("n_pred") == 2L)
    assert(r.getAs[Long]("tp") == 1L && r.getAs[Long]("fp") == 1L &&
      r.getAs[Long]("fn") == 2L)
    assert(r.getAs[Long]("precision_bp") == 5000L)
    assert(r.getAs[Long]("recall_bp") == 3333L)
    // f1 = 2·1·10⁴ div (2·1 + 1 + 2) = 4000
    assert(r.getAs[Long]("f1_bp") == 4000L)
  }

  test("pairConfusion: empty prediction yields NULL precision, 0 recall") {
    val truth = Seq((1L, 2L), (2L, 3L)).toDF("doc_i", "doc_j")
    val pred = Seq.empty[(Long, Long)].toDF("doc_i", "doc_j")
    val r = Eval.pairConfusion(truth, pred, "doc_i", "doc_j").collect().head
    assert(r.getAs[Long]("tp") == 0L && r.getAs[Long]("fn") == 2L)
    assert(r.isNullAt(r.fieldIndex("precision_bp")))
    assert(r.getAs[Long]("recall_bp") == 0L)
    assert(r.getAs[Long]("f1_bp") == 0L)
  }

  test("pairConfusion: both sides empty yields the all-NULL bp row") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_i", "doc_j")
    val r = Eval.pairConfusion(empty, empty, "doc_i", "doc_j").collect().head
    assert(r.getAs[Long]("n_truth") == 0L && r.getAs[Long]("n_pred") == 0L)
    Seq("precision_bp", "recall_bp", "f1_bp")
      .foreach(c => assert(r.isNullAt(r.fieldIndex(c)), c))
  }

  test("pairConfusion against itself is perfect on a real sweep") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val pairs = Dedup.jaccardPairs(d, "doc_id", "text", 3, 0.8)
    val r = Eval.pairConfusion(pairs, pairs, "doc_i", "doc_j").collect().head
    assert(r.getAs[Long]("fp") == 0L && r.getAs[Long]("fn") == 0L)
    if (r.getAs[Long]("tp") > 0L) {
      assert(r.getAs[Long]("precision_bp") == 10000L)
      assert(r.getAs[Long]("f1_bp") == 10000L)
    }
  }
}
