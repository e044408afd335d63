package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payload columns with typed metadata, plus batch-shaped decode /
  * feature-extraction / frame-sampling plumbing.
  *
  * The decode step is REAL for the JDK-native codecs — PNG/BMP/JPEG/GIF
  * via `javax.imageio` and 16-bit PCM WAV via `javax.sound.sampled` —
  * and falls back to a deterministic byte-mean stub for payloads no
  * shipped codec understands (e.g. video containers; no external codec
  * libraries exist in this container). Everything Spark-side is real and
  * tested — the schema, the binary column flow, the modality
  * partitioning, the per-partition batch iterator shape (`mapPartitions`,
  * the Scala analog of `mapInPandas` batches), and the feature-vector
  * output contract (`array<float>` ready for [[Similarity]]).
  *
  * Scale posture: payloads stay opaque bytes end-to-end (no driver
  * collect); decode is a per-partition map — at 100 TB you repartition by
  * modality (codec affinity → better batch locality, one codec per task)
  * and let the scan prune to (media_id, payload) only.
  */
object Multimodal {

  /** Deterministic media fixture derived from `documents`: payload =
    * UTF-8 bytes of the text (an opaque stand-in blob), modality cycled,
    * metadata derived from doc stats — the shapes a real ingest would
    * carry (width/height for images, sample_rate/duration for audio). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("modality"),
      col("text").cast("binary").as("payload"),
      struct(
        (lit(64) + pmod(col("doc_id"), lit(16)) * 16).cast("int").as("width"),
        (lit(64) + pmod(col("doc_id"), lit(8)) * 32).cast("int").as("height"),
        (lit(8000) + pmod(col("doc_id"), lit(4)) * 8000).cast("int").as("sample_rate"),
        (col("n_chars") * 10).cast("int").as("duration_ms")).as("meta"))

  /** Repartition by modality bucket — co-locates same-codec payloads so a
    * decode task touches one codec (the partitioning step a real decode
    * fleet needs; buckets spread each modality over `perModality` tasks
    * to keep parallelism). */
  def partitionByModality(media: DataFrame, perModality: Int = 8): DataFrame =
    media.repartition(3 * perModality, col("modality"),
      pmod(col("media_id"), lit(perModality)))

  /** Fixed-size byte frames of every payload: (media_id, frame_idx,
    * frame_bytes). Pure codegen'd expressions (`substring` on binary) —
    * the frame-sampling path stays in whole-stage codegen. */
  def frameSample(media: DataFrame, frameBytes: Int = 32): DataFrame = {
    val nFrames = ceil(length(col("payload")) / lit(frameBytes.toDouble)).cast("int")
    val idxs = when(nFrames > 0, sequence(lit(0), nFrames - 1))
      .otherwise(array().cast("array<int>"))
    media
      .select(col("media_id"), col("payload"),
        posexplode(idxs).as(Seq("frame_idx", "f")))
      .select(col("media_id"), col("frame_idx"),
        substring_index_bytes(col("payload"), col("frame_idx"), frameBytes)
          .as("frame_bytes"))
  }

  private def substring_index_bytes(payload: org.apache.spark.sql.Column,
                                    idx: org.apache.spark.sql.Column,
                                    frameBytes: Int) =
    substring(payload, idx * frameBytes + 1, lit(frameBytes))

  /** Deterministic nearest-neighbor "resize" of every payload to a fixed
    * byte budget (`outBytes`, e.g. 64 = an 8×8 thumbnail's worth): output
    * byte k is input byte ⌊k·n/outBytes⌋ — the classic nearest-neighbor
    * downsample applied to the flat byte stream. A REAL pixel-space
    * resize needs the decoded raster (see [[decodeFeatures]]'s stub
    * note); the Spark-side contract — fixed-size binary out, pure
    * codegen'd expressions, no UDF, no shuffle — is exactly what the
    * production version keeps. Payloads shorter than `outBytes` upsample
    * by repetition (floor index repeats bytes). */
  def resizeStub(media: DataFrame, outBytes: Int = 64): DataFrame = {
    // long arithmetic: k·n as INT wraps silently past 2^31 (payloads over
    // ~34 MB at k=63 under non-ANSI eval) — the quotient itself always
    // fits an int (≤ n), so only the product needs widening.
    val n = length(col("payload")).cast("long")
    val pieces = (0 until outBytes).map { k =>
      substring(col("payload"),
        floor(lit(k.toLong) * n / lit(outBytes)).cast("int") + 1, lit(1))
    }
    media.select(col("media_id"), col("modality"),
      concat(pieces: _*).as("resized"))
  }

  /** Batch decode → fixed-dim feature vector per media row.
    *
    * REAL decode paths, JDK-native (no external codec deps):
    *   - images (PNG/BMP/JPEG/GIF, sniffed by magic bytes) via
    *     `javax.imageio` → per-vertical-band mean luminance in [0,1];
    *   - WAV 16-bit signed PCM via `javax.sound.sampled` → per-time-bucket
    *     mean |amplitude| of channel 0 in [0,1].
    * Payloads that are neither (or that a codec rejects) fall back to the
    * deterministic byte-mean stub — so arbitrary opaque blobs still flow
    * through the pipeline and the output contract never breaks. Dispatch
    * is by CONTENT (magic bytes), not the `modality` column: real ingest
    * metadata lies often enough that a decode fleet must sniff anyway.
    *
    * Shape contract: input rows need (media_id, modality, payload);
    * output is (media_id, modality, features array<float> of `dim`),
    * ANN-ready for [[Similarity]]. Decode is a per-partition map — no
    * shuffle, no driver collect; pair with [[partitionByModality]] for
    * codec-affine task batches at scale. */
  def decodeFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val out = media.select("media_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        // never spill ImageIO stream caches to executor-local disk
        javax.imageio.ImageIO.setUseCache(false)
        batch.map { case (id, modality, payload) =>
          (id, modality, decodeOne(payload, dim))
        }
      }
    out.toDF("media_id", "modality", "features")
  }

  /** Single-payload decode: sniff, decode, fall back to the stub on any
    * codec failure. Exposed package-private for direct spec coverage. */
  private[graft] def decodeOne(payload: Array[Byte], dim: Int): Array[Float] =
    if (payload == null || payload.length == 0) new Array[Float](dim)
    else {
      val decoded =
        if (looksLikeImage(payload)) imageFeatures(payload, dim)
        else if (looksLikeWav(payload)) wavFeatures(payload, dim)
        else None
      decoded.getOrElse(stubFeatures(payload, dim))
    }

  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length > 8 && (
      ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') || // PNG
      (b(0) == 'B' && b(1) == 'M') ||                                         // BMP
      ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) ||                     // JPEG
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F'))                            // GIF

  private def looksLikeWav(b: Array[Byte]): Boolean =
    b.length > 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** dim vertical bands (x-ranges), mean luminance per band / 255. */
  private def imageFeatures(payload: Array[Byte], dim: Int): Option[Array[Float]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val sums = new Array[Double](dim)
        val counts = new Array[Long](dim)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
            val d = math.min(dim - 1, x * dim / w)
            sums(d) += lum
            counts(d) += 1
            x += 1
          }
          y += 1
        }
        Some(Array.tabulate(dim)(d =>
          if (counts(d) > 0) (sums(d) / counts(d) / 255.0).toFloat else 0f))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** dim time buckets over frames, mean |sample| of channel 0 / 2^15
    * (16-bit signed PCM only — the WAV baseline; anything else falls
    * back to the stub rather than guessing at sample layout). */
  private def wavFeatures(payload: Array[Byte], dim: Int): Option[Array[Float]] =
    try {
      val in = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val isPcm16 =
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
            fmt.getSampleSizeInBits == 16
        if (!isPcm16) None
        else {
          val data = in.readAllBytes()
          val frameBytes = 2 * fmt.getChannels
          val nFrames = data.length / frameBytes
          if (nFrames == 0) None
          else {
            val sums = new Array[Double](dim)
            val counts = new Array[Long](dim)
            var f = 0
            while (f < nFrames) {
              val base = f * frameBytes // channel 0 sample
              val sample =
                if (fmt.isBigEndian) ((data(base) << 8) | (data(base + 1) & 0xff)).toShort
                else ((data(base + 1) << 8) | (data(base) & 0xff)).toShort
              val d = math.min(dim - 1, (f.toLong * dim / nFrames).toInt)
              sums(d) += math.abs(sample.toDouble)
              counts(d) += 1
              f += 1
            }
            Some(Array.tabulate(dim)(d =>
              if (counts(d) > 0) (sums(d) / counts(d) / 32768.0).toFloat else 0f))
          }
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic fallback for unknown codecs: per-chunk mean byte value
    * normalized to [0,1] — keeps arbitrary blobs flowing end-to-end. */
  private def stubFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val feats = new Array[Float](dim)
    val chunk = math.max(1, payload.length / dim)
    var d = 0
    while (d < dim) {
      val from = d * chunk
      val until = math.min(payload.length, from + chunk)
      var sum = 0L
      var i = from
      while (i < until) { sum += payload(i) & 0xff; i += 1 }
      feats(d) = if (until > from) (sum.toDouble / (until - from) / 255.0).toFloat else 0f
      d += 1
    }
    feats
  }
}
