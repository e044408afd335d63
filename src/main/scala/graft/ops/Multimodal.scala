package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payload columns with typed metadata, plus batch-shaped decode /
  * feature-extraction / frame-sampling plumbing.
  *
  * The DECODE STEP IS A DETERMINISTIC STUB (clearly marked below): real
  * codec libraries (JPEG/PNG/PCM/video) are not available in this
  * container. Everything Spark-side is real and tested — the schema, the
  * binary column flow, the modality partitioning, the per-partition batch
  * iterator shape (`mapPartitions`, the Scala analog of `mapInPandas`
  * batches), and the feature-vector output contract
  * (`array<float>` ready for [[Similarity]]).
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

  /** Batch "decode" → fixed-dim feature vector per media row.
    *
    * ??? REAL DECODER GOES HERE — STUBBED ???
    * A production build decodes the codec batch-wise (JPEG → pixels,
    * PCM → samples) inside this partition iterator. The stub derives a
    * deterministic fake feature vector (per-chunk mean byte value,
    * normalized to [0,1]) so the full pipeline — schema, batching,
    * partition shape, downstream ANN over the features — is executable
    * and testable without codec libs.
    *
    * Shape contract: input rows need (media_id, modality, payload);
    * output is (media_id, modality, features array<float> of `dim`). */
  def decodeFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val out = media.select("media_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, modality, payload) =>
          val feats = new Array[Float](dim)
          if (payload != null && payload.length > 0) {
            val chunk = math.max(1, payload.length / dim)
            var d = 0
            while (d < dim) {
              val from = d * chunk
              val until = math.min(payload.length, from + chunk)
              var sum = 0L
              var i = from
              while (i < until) { sum += payload(i) & 0xff; i += 1 }
              feats(d) = if (until > from) (sum.toDouble / (until - from) / 255.0).toFloat
                         else 0f
              d += 1
            }
          }
          (id, modality, feats)
        }
      }
    out.toDF("media_id", "modality", "features")
  }
}
