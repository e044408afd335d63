package graft

import org.apache.spark.sql.functions._
import graft.ops.Composition

class CompositionSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("shuffled is deterministic in (id, seed) and collision-free") {
    val a = Composition.shuffled(docs, "doc_id", 42L)
      .select("doc_id", "shuffle_key").collect().map(r => (r.getLong(0), r.getString(1)))
    val b = Composition.shuffled(docs, "doc_id", 42L)
      .select("doc_id", "shuffle_key").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.sortBy(_._1).sameElements(b.sortBy(_._1)), "same seed, same keys")
    assert(a.map(_._2).distinct.length == a.length, "128-bit keys don't collide")
    val other = Composition.shuffled(docs, "doc_id", 7L)
      .select("doc_id", "shuffle_key").collect().map(r => (r.getLong(0), r.getString(1)))
    val orderA = a.sortBy(_._2).map(_._1).toSeq
    val orderOther = other.sortBy(_._2).map(_._1).toSeq
    assert(orderA != orderOther, "different seed, different permutation")
  }

  test("repartitionByRange realizes the shuffle order without a global sort") {
    // the documented writer contract: range-partition by key, sort within
    // partitions, read files in partition order = the total key order
    val keyed = Composition.shuffled(docs, "doc_id", 42L)
      .repartitionByRange(4, col("shuffle_key"))
      .sortWithinPartitions("shuffle_key")
    val perPart = keyed.select(spark_partition_id().as("p"), col("shuffle_key"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    val globalOrder = perPart.sortBy(t => (t._1, t._2)).map(_._2).toSeq
    assert(globalOrder == perPart.map(_._2).sorted.toSeq,
      "partition-major read order equals the total key order")
  }

  test("tokenBudgetPerSource keeps a per-source hash-order prefix within budget") {
    val out = Composition.tokenBudgetPerSource(
      docs, "doc_id", "source", "n_chars", 3000L)
    val sums = out.groupBy("source").agg(sum("n_chars").as("s"))
      .collect().map(_.getLong(1))
    assert(sums.nonEmpty && sums.forall(_ <= 3000L), "every source within budget")
    // prefix property: a kept doc's cumulative position precedes every
    // dropped doc of the same source in the (source, md5 key) order
    val keyed = docs.withColumn("k", Composition.shuffleKey(col("doc_id"), 42L))
      .select("source", "doc_id", "n_chars", "k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    keyed.groupBy(_._1).foreach { case (_, rows) =>
      val inOrder = rows.sortBy(_._4)
      var cum = 0L
      inOrder.foreach { case (_, id, n, _) =>
        cum += n
        assert(kept.contains(id) == (cum <= 3000L),
          s"doc $id kept iff its running total $cum fits the budget")
      }
    }
  }

  test("splitAssign is a disjoint, stable, roughly-proportional partition") {
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val out = Composition.splitAssign(docs, "doc_id", splits)
    val counts = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    assert(n == docs.count(), "every doc lands in exactly one split")
    assert(counts("train") > n * 7 / 10, s"train holds the bulk: $counts")
    assert(counts.getOrElse("val", 0L) + counts.getOrElse("test", 0L) < n / 4)
    // stability under corpus growth: membership of existing docs never moves
    val half = docs.filter($"doc_id" % 2 === 0)
    val fromHalf = Composition.splitAssign(half, "doc_id", splits)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val fromFull = out.filter($"doc_id" % 2 === 0)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(fromHalf == fromFull, "a doc's split depends on its id alone")
  }

  test("reweightToTarget hits the target mix within hash noise, is " +
       "partition-invariant, and drops unlisted classes") {
    val target = Seq("en" -> 40L, "de" -> 30L, "es" -> 30L)
    val kept = Composition.reweightToTarget(docs, "doc_id", "lang", target)
    val counts = kept.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // unlisted langs are gone
    assert(counts.keySet.subsetOf(target.map(_._1).toSet))
    // proportions approximate the target: each class within ±20% relative
    val n = counts.values.sum.toDouble
    target.foreach { case (cls, w) =>
      val got = counts.getOrElse(cls, 0L) / n
      val want = w.toDouble / target.map(_._2).sum
      assert(math.abs(got - want) < want * 0.2,
        s"$cls share $got vs target $want ($counts)")
    }
    // never keeps more than the class has; membership is per-row stable
    val perLang = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (cls, c) => assert(c <= perLang(cls)) }
    val again = Composition.reweightToTarget(docs.repartition(7), "doc_id",
      "lang", target).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == kept.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("interleaved ranks are a within-source permutation") {
    val out = Composition.interleaved(docs, "doc_id", "source")
    val bySource = out.select("source", "interleave_rank")
      .collect().map(r => (r.getString(0), r.getInt(1))).groupBy(_._1)
    bySource.foreach { case (src, rows) =>
      val ranks = rows.map(_._2).sorted.toSeq
      assert(ranks == (1 to rows.length), s"$src ranks form 1..n")
    }
    // round-robin property: the first |sources| docs in (rank, source)
    // order are one doc from EACH source
    val firstWave = out.orderBy("interleave_rank", "source")
      .limit(bySource.size).select("source").collect().map(_.getString(0))
    assert(firstWave.distinct.length == bySource.size,
      "training order opens with one doc per source")
  }
}
