package graft

import org.apache.spark.sql.functions._
import graft.ops.Embeddings

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  test("l2Normalize: unit norm on a known vector; zero vector unchanged") {
    val df = Seq((1L, Array(3.0f, 4.0f)), (2L, Array(0.0f, 0.0f)))
      .toDF("id", "v")
      .select($"id", Embeddings.l2Normalize($"v").as("n"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(m(1L) == Seq(0.6f, 0.8f))
    assert(m(2L) == Seq(0.0f, 0.0f))
  }

  test("quantizeInt8: floor(+0.5) rounding, symmetric scale, roundtrip bound") {
    val df = Seq((1L, Array(1.0f, -0.5f, 0.25f)), (2L, Array(0.0f, 0.0f, 0.0f)))
      .toDF("id", "v")
      .select($"id", Embeddings.quantizeInt8($"v").as("qz"), $"v")
    val rows = df.select($"id", $"qz.q", $"qz.scale", $"v").collect()
    val byId = rows.map(r => r.getLong(0) ->
      ((r.getSeq[Int](1), r.getDouble(2), r.getSeq[Float](3)))).toMap
    val (q1, s1, v1) = byId(1L)
    assert(s1 == 127.0)
    assert(q1 == Seq(127, -63, 32)) // floor(127.5), floor(-63.0), floor(32.25)
    // dequantized values within half a quantization step
    q1.zip(v1).foreach { case (q, v) =>
      assert(math.abs(q / s1 - v) <= 0.5 / s1 + 1e-12)
    }
    val (q2, s2, _) = byId(2L)
    assert(s2 == 0.0 && q2 == Seq(0, 0, 0))
  }

  test("fixture embeddings: normalized vectors have unit norm") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(Embeddings.l2Normalize(col("embedding")).as("n"))
    val norms = e.select(graft.ops.Dedup.l2norm(col("n")).as("nn"))
      .agg(min("nn"), max("nn")).head()
    assert(math.abs(norms.getDouble(0) - 1.0) < 1e-6)
    assert(math.abs(norms.getDouble(1) - 1.0) < 1e-6)
  }
}
