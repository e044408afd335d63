package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.io.TrainingShards
import graft.ops.{Packing, TextAnalysis}

class TrainingShardsSpec extends SparkSpec {
  import spark.implicits._

  private def packedSeqs() = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val packed = Packing.nextFitPack(docs, "doc_id",
      size(TextAnalysis.tokens(col("text"))), budget = 256, groups = 4)
    Packing.materializeBins(packed, docs, "doc_id", "text")
  }

  test("shard membership is deterministic across re-runs; manifest reconciles") {
    val seqs = packedSeqs()
    val dir1 = Files.createTempDirectory("shards1").toString
    val dir2 = Files.createTempDirectory("shards2").toString
    val m1 = TrainingShards.write(seqs, Seq("pack_group", "bin_id"), dir1, 4)
      .collect()
    TrainingShards.write(seqs, Seq("pack_group", "bin_id"), dir2, 4)
    def membership(p: String) = TrainingShards.read(spark, p)
      .select("shard", "pack_group", "bin_id").collect()
      .map(r => (r.get(0), r.get(1), r.get(2))).toSet
    assert(membership(dir1) == membership(dir2))
    // manifest totals reconcile with the data
    assert(m1.map(_.getAs[Long]("n_sequences")).sum == seqs.count())
    val tokensTotal = seqs.agg(sum("fill")).head().getLong(0)
    assert(m1.map(_.getAs[Long]("n_tokens")).sum == tokensTotal)
    // every shard id within range, all shards described
    assert(m1.map(_.getAs[Int]("shard")).toSet.subsetOf((0 until 4).toSet))
  }

  test("manifest covers the FULL shard range, empty shards at zero") {
    val seqs = packedSeqs().limit(3) // 3 sequences into 16 shards
    val dir = Files.createTempDirectory("shards4").toString
    val m = TrainingShards.write(seqs, Seq("pack_group", "bin_id"), dir, 16)
      .collect()
    assert(m.length == 16)
    assert(m.map(_.getAs[Long]("n_sequences")).sum == 3L)
    val empty = m.filter(_.getAs[Long]("n_sequences") == 0L)
    assert(empty.nonEmpty)
    empty.foreach { r =>
      assert(r.getAs[Long]("n_tokens") == 0L)
      assert(r.isNullAt(r.fieldIndex("first_key")))
    }
  }

  test("within-shard order follows the shuffle key; manifest ranges match") {
    val seqs = packedSeqs()
    val dir = Files.createTempDirectory("shards3").toString
    val manifest = TrainingShards.write(seqs, Seq("pack_group", "bin_id"), dir, 3)
      .collect().map(r => r.getInt(0) ->
        (r.getAs[String]("first_key"), r.getAs[String]("last_key"))).toMap
    val back = TrainingShards.read(spark, dir)
    (0 until 3).foreach { s =>
      val keys = back.filter(col("shard") === s)
        .select("shuffle_key").as[String].collect()
      if (keys.nonEmpty) {
        assert(keys.min == manifest(s)._1 && keys.max == manifest(s)._2)
      }
    }
    // the reader contract, end to end: shardId is MONOTONE in the key
    // prefix, so shards hold contiguous key ranges — consuming shards
    // in shard_id order (rows key-ordered within) replays the one
    // global md5-key permutation exactly
    val all = back.select("shard", "shuffle_key").as[(Int, String)].collect()
    assert(all.map(_._2).distinct.length == all.length) // md5 keys unique
    val replay = (0 until 3).flatMap { s =>
      all.filter(_._1 == s).map(_._2).sorted
    }
    assert(replay == all.map(_._2).sorted.toSeq,
      "shard-order consumption must equal the global key order")
  }
}
