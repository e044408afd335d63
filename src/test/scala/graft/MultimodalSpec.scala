package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val media = Multimodal.mediaFromDocuments(docs)

  test("media schema: opaque binary payload + typed metadata") {
    val f = media.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(f("payload") == "binary")
    assert(f("meta") == "struct")
    val m = media.filter($"media_id" === 3L).select("modality", "meta.width").first()
    assert(m.getString(0) == "image")
    assert(m.getInt(1) == 64 + 3 * 16)
  }

  test("payload round-trips the source bytes") {
    val r = media.join(docs, $"media_id" === $"doc_id")
      .select($"payload", $"text").first()
    assert(new String(r.getAs[Array[Byte]](0), "UTF-8") == r.getString(1))
  }

  test("frameSample covers every byte, last frame ragged") {
    val one = media.filter($"media_id" === 0L)
    val n = one.select(length($"payload")).first().getInt(0)
    val frames = Multimodal.frameSample(one, 32)
      .orderBy("frame_idx")
      .select(length($"frame_bytes")).collect().map(_.getInt(0))
    assert(frames.length == math.ceil(n / 32.0).toInt)
    assert(frames.sum == n)
    assert(frames.init.forall(_ == 32))
  }

  test("decodeFeatures: fixed dim, [0,1] range, deterministic") {
    val f1 = Multimodal.decodeFeatures(Multimodal.partitionByModality(media), 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(f1.nonEmpty)
    f1.values.foreach { v =>
      assert(v.length == 8)
      assert(v.forall(x => x >= 0f && x <= 1f))
    }
    val f2 = Multimodal.decodeFeatures(media, 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(f1 == f2, "decode stub must be deterministic and partition-invariant")
  }

  test("resizeStub emits a fixed byte budget with nearest-neighbor indexing") {
    val out = Multimodal.resizeStub(media, 64)
    assert(out.select(length($"resized")).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(64), "every payload resizes to 64 bytes")
    // upsampling-by-repetition: a 2-byte payload resized to 4 is ABBB? no —
    // indices floor(k*2/4) = 0,0,1,1 -> AABB
    val tiny = Multimodal.resizeStub(
      Seq((1L, "img", "AB".getBytes("UTF-8"))).toDF("media_id", "modality", "payload"), 4)
    assert(new String(tiny.first().getAs[Array[Byte]]("resized"), "UTF-8") == "AABB")
  }

  test("features feed the ANN path (Similarity over decoded vectors)") {
    val feats = Multimodal.decodeFeatures(media, 8)
      .select($"media_id".as("vec_id"), $"features".as("embedding"))
    val out = graft.ops.Similarity.bruteForceTopK(
      feats, feats.filter($"vec_id" < 2), "vec_id", "embedding", 3)
    assert(out.count() == 6) // 2 queries x top-3
  }
}
