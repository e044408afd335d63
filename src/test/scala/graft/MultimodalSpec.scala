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

  // ---- real JDK-codec decode paths ----

  private def pngBytes(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wavBytes(samples: Array[Short], sampleRate: Float = 8000f): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val pcm = new Array[Byte](samples.length * 2) // little-endian mono
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real PNG decode: vertical-band mean luminance, not the byte stub") {
    // 32x8, left half black, right half white -> bands 0-3 ~ 0, bands 4-7 ~ 1
    val png = pngBytes(32, 8)((x, _) => if (x < 16) 0x000000 else 0xffffff)
    val feats = Multimodal.decodeOne(png, 8)
    assert(feats.length == 8)
    assert(feats.take(4).forall(_ < 0.01f), s"dark bands: ${feats.mkString(",")}")
    assert(feats.drop(4).forall(_ > 0.99f), s"bright bands: ${feats.mkString(",")}")
  }

  test("real WAV decode: per-time-bucket mean amplitude of the PCM samples") {
    // 800 frames: first half silence, second half a +/-16384 square wave
    val samples = Array.tabulate[Short](800)(i =>
      if (i < 400) 0 else if (i % 2 == 0) 16384 else -16384)
    val feats = Multimodal.decodeOne(wavBytes(samples), 8)
    assert(feats.take(4).forall(_ < 0.01f), s"silent buckets: ${feats.mkString(",")}")
    assert(feats.drop(4).forall(f => math.abs(f - 0.5f) < 0.01f),
      s"square-wave buckets: ${feats.mkString(",")}")
  }

  test("decodeFeatures end-to-end routes real codecs and stub by content") {
    val png = pngBytes(16, 4)((_, _) => 0xffffff)             // all-white image
    val wav = wavBytes(Array.fill[Short](400)(16384))         // constant amplitude
    val blob = "just some opaque text bytes".getBytes("UTF-8") // no codec: stub
    val df = Seq(
      (1L, "image", png), (2L, "audio", wav), (3L, "video", blob))
      .toDF("media_id", "modality", "payload")
    val out = Multimodal.decodeFeatures(df, 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(out(1L).forall(_ > 0.99f), "white image decodes to ~1.0 luminance")
    assert(out(2L).forall(f => math.abs(f - 0.5f) < 0.01f),
      "constant half-scale PCM decodes to ~0.5 amplitude")
    // the stub path is unchanged: same chunked byte-mean as before
    val expected = {
      val chunk = blob.length / 4
      (0 until 4).map { d =>
        val s = blob.slice(d * chunk, d * chunk + chunk)
        (s.map(_ & 0xff).sum.toDouble / s.length / 255.0).toFloat
      }
    }
    assert(out(3L) == expected, "unknown codec falls back to the byte-mean stub")
  }

  test("corrupt magic bytes fall back to the stub instead of failing the task") {
    val fakePng = Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3, 4, 5, 6, 7, 8, 9)
    val feats = Multimodal.decodeOne(fakePng, 4)
    assert(feats.length == 4) // stub output, no exception
  }
}
