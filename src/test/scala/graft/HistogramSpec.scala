package graft

import org.apache.spark.sql.functions._
import graft.ops.Histogram

class HistogramSpec extends SparkSpec {
  import spark.implicits._

  test("bin counts total the in-range rows; edges tile the range") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val h = Histogram.histogram(docs, "n_chars", 0L, 1023L, 16)
      .orderBy("bin").collect()
    assert(h.length == 16)
    val total = docs.filter(col("n_chars").between(0, 1023)).count()
    assert(h.map(_.getAs[Long]("n")).sum == total)
    // contiguous inclusive tiling
    h.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("bin_lo") == a.getAs[Long]("bin_hi") + 1)
    }
    assert(h.head.getAs[Long]("bin_lo") == 0L)
    assert(h.last.getAs[Long]("bin_hi") == 1023L)
  }

  test("empty bins are materialized with n = 0") {
    val df = Seq(1L, 2L, 100L).toDF("v")
    val h = Histogram.histogram(df, "v", 0L, 127L, 8).orderBy("bin").collect()
    assert(h.length == 8)
    assert(h.count(_.getAs[Long]("n") == 0L) == 6)
    assert(h.map(_.getAs[Long]("n")).sum == 3L)
  }

  test("out-of-range values are dropped; last bin absorbs the remainder") {
    val df = Seq(-5L, 0L, 9L, 10L, 11L).toDF("v")
    val h = Histogram.histogram(df, "v", 0L, 10L, 3).orderBy("bin").collect()
    // width = ceil(10/3)=4 → bins [0,3][4,7][8,10]
    assert(h.map(r => (r.getAs[Long]("bin_lo"), r.getAs[Long]("bin_hi"))).toSeq ==
      Seq((0L, 3L), (4L, 7L), (8L, 10L)))
    assert(h.map(_.getAs[Long]("n")).toSeq == Seq(1L, 0L, 2L))
  }

  test("histogramAuto derives edges from the column extrema") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val h = Histogram.histogramAuto(docs, "n_chars", 8).orderBy("bin").collect()
    assert(h.map(_.getAs[Long]("n")).sum == docs.count())
  }

  test("equiDepth: counts total n and buckets are near-equal on distinct data") {
    val df = spark.range(1, 81).select(col("id").as("v")) // 80 distinct values
    val h = Histogram.equiDepth(df, "v", 8).orderBy("bucket").collect()
    assert(h.length == 8)
    assert(h.map(_.getAs[Long]("n")).sum == 80L)
    // distinct values split exactly: 10 per bucket
    assert(h.forall(_.getAs[Long]("n") == 10L))
    // bucket value ranges are disjoint and ordered
    h.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi") < b.getAs[Long]("lo"))
    }
  }

  test("equiDepth: boundary ties collapse into one bucket, honestly") {
    // 9 copies of 5 plus 1 and 100: nominal quartile edges all hit 5
    val df = (Seq(1L, 100L) ++ Seq.fill(9)(5L)).toDF("v")
    val h = Histogram.equiDepth(df, "v", 4).orderBy("bucket").collect()
    assert(h.map(_.getAs[Long]("n")).sum == 11L)
    // ties land together: the bucket holding 5 has all nine copies
    assert(h.exists(r => r.getAs[Long]("n") == 9L || r.getAs[Long]("n") == 10L))
    // empty buckets materialized with null lo/hi
    h.filter(_.getAs[Long]("n") == 0L).foreach { r =>
      assert(r.isNullAt(r.fieldIndex("lo")) && r.isNullAt(r.fieldIndex("hi")))
    }
  }
}
