package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The LAST mile of a training-data pipeline: packed sequences →
  * reproducibly-shuffled, shard-addressed training files plus a
  * manifest a data loader can trust. Composes the existing operators —
  * [[graft.ops.Packing]] built the sequences, [[graft.ops.Composition]]
  * owns the deterministic order — this writer owns the LAYOUT contract:
  *
  *  - shard assignment is a pure function of the sequence's shuffle key
  *    (md5 hex prefix → shard id), so re-running the pipeline writes
  *    byte-identical shard MEMBERSHIP — no round-robin, no
  *    partition-index dependence, no `rand()`;
  *  - within a shard, rows are sorted by the full shuffle key
  *    (`sortWithinPartitions` after `repartition(shard)` — each shard
  *    is one task's output, no global sort barrier);
  *  - the manifest (one row per shard: sequences, token sum, key range)
  *    is derived from the SAME frame in one aggregation, so it can't
  *    drift from the data it describes.
  *
  * Reader contract: consume shards in shard_id order, rows in file
  * order — that replays the [[graft.ops.Composition.shuffled]]
  * permutation. */
object TrainingShards {

  /** Assign each row a deterministic shard in [0, shards): the first 8
    * hex chars of the md5 shuffle key, scaled — uniform and stable. */
  def shardId(shuffleKey: org.apache.spark.sql.Column, shards: Int)
      : org.apache.spark.sql.Column =
    (conv(substring(shuffleKey, 1, 8), 16, 10).cast("long") * shards /
      4294967296L).cast("int")

  /** Write `seqs` (expects columns `seq_text` and `n_tokens`-like
    * `fill`; extra columns pass through) as `shards` parquet shard
    * directories under `path/shard=K`, plus `path/_manifest` (parquet,
    * one row per shard id in [0, shards) — EMPTY shards included with
    * zero counts, so a loader can validate against the full shard
    * range). The input frame is persisted across the two write jobs —
    * the manifest describes exactly the snapshot the shard files hold,
    * even over a source that changes between jobs — and the RETURNED
    * manifest is read back from disk, consistent by construction. */
  def write(seqs: DataFrame, idCols: Seq[String], path: String,
            shards: Int, seed: Long = 42L): DataFrame = {
    require(shards > 0, "need at least one shard")
    val spark = seqs.sparkSession
    val key = graft.ops.Composition.shuffleKey(
      concat_ws(":", idCols.map(col): _*), seed)
    val framed = seqs
      .withColumn("shuffle_key", key)
      .withColumn("shard", shardId(col("shuffle_key"), shards))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // each shard is one write task: hash-repartition BY THE SHARD id,
      // order rows by the key inside — no global sort
      framed
        .repartition(shards, col("shard"))
        .sortWithinPartitions("shard", "shuffle_key")
        .write.mode("overwrite").partitionBy("shard").parquet(path)
      val counted = framed.groupBy("shard")
        .agg(count(lit(1)).as("n_sequences"),
          sum(col("fill")).as("n_tokens"),
          min("shuffle_key").as("first_key"),
          max("shuffle_key").as("last_key"))
      val manifest = spark.range(shards).select(col("id").cast("int").as("shard"))
        .join(counted, Seq("shard"), "left")
        .select(col("shard"),
          coalesce(col("n_sequences"), lit(0L)).as("n_sequences"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          col("first_key"), col("last_key"))
        .orderBy("shard")
      manifest.coalesce(1).write.mode("overwrite").parquet(s"$path/_manifest")
    } finally framed.unpersist(blocking = false)
    readManifest(spark, path)
  }

  /** Re-open a shard directory written by [[write]]. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Re-open the manifest. */
  def readManifest(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/_manifest")
}
