package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

class SamplingSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("hashSample: deterministic, partition-invariant, near the fraction") {
    val a = Sampling.hashSample(docs, Seq("doc_id"), 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(17), Seq("doc_id"), 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "membership must not depend on partitioning")
    val frac = a.size.toDouble / docs.count()
    assert(frac > 0.2 && frac < 0.4, s"observed fraction $frac")
  }

  test("hashSample nests: a 10% sample is a subset of the 30% sample") {
    val small = Sampling.hashSample(docs, Seq("doc_id"), 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val big = Sampling.hashSample(docs, Seq("doc_id"), 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
  }

  test("stratifiedHashSample applies per-stratum fractions") {
    val out = Sampling.stratifiedHashSample(docs, "lang", Seq("doc_id"),
      Map("en" -> 1.0, "de" -> 0.0), default = 0.0)
    val langs = out.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en")))
    val enTotal = docs.filter(col("lang") === "en").count()
    assert(out.count() == enTotal, "fraction 1.0 keeps the whole stratum")
  }

  test("systematicSample keeps exactly key % every < take") {
    val out = Sampling.systematicSample(docs, "doc_id", 10L, 3L)
      .select("doc_id").collect().map(_.getLong(0))
    assert(out.forall(id => id % 10 < 3))
    assert(out.length == docs.filter(col("doc_id") % 10 < 3).count())
  }

  test("repeatByStratum up-samples per source; repeat 0 drops the stratum") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "src")
    val out = Sampling.repeatByStratum(df, "src", Map("a" -> 3, "c" -> 0))
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(out.toSeq.sorted == Seq((1L, 1), (1L, 2), (1L, 3), (2L, 1)))
  }

  test("stratumTopK takes exactly k per stratum, stable under partitioning") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang")
    val out = Sampling.stratumTopK(docs, "lang", "doc_id", 5)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.nonEmpty && counts.values.forall(_ == 5L),
      s"exactly k per stratum: $counts")
    val again = Sampling.stratumTopK(docs.repartition(13), "lang", "doc_id", 5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val first = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(again == first, "membership independent of physical layout")
  }

  test("weightedSample: deterministic, layout-invariant, weight-monotone, edge cases") {
    import spark.implicits._
    // two weight classes: ids 0-199 weight 1, ids 200-399 weight 10 —
    // the heavy class must dominate a half-size sample (P(heavy beats
    // light) = 10/11 pairwise in the exponential race)
    val df = (0L until 400L).map(i => (i, if (i < 200) 1L else 10L))
      .toDF("id", "w")
    val picked = Sampling.weightedSample(df, "id", "w", 200)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(picked.size == 200)
    val heavy = picked.count(_ >= 200)
    assert(heavy > 140, s"heavy class underrepresented: $heavy/200")
    // same rows regardless of physical layout
    val again = Sampling.weightedSample(df.repartition(17), "id", "w", 200)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == picked)
    // k >= eligible rows returns all eligible; weight <= 0 never qualifies
    val withZero = df.withColumn("w",
      when(col("id") < 10, lit(0L)).otherwise(col("w")))
    val all = Sampling.weightedSample(withZero, "id", "w", 1000)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(all.size == 390 && !all.exists(_ < 10))
    assert(Sampling.weightedSample(df, "id", "w", 0).count() == 0)
  }
}
