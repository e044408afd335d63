package graft

import org.apache.spark.sql.functions._
import graft.functions.Sum128.sum128

class Sum128Spec extends SparkSpec {
  import spark.implicits._

  test("matches decimal sum on signed values incl. nulls") {
    val vs: Seq[java.lang.Long] = Seq(5L, -3L, 0L, null, Long.MaxValue / 3,
      -(Long.MaxValue / 5), 42L, null, -1L)
    val df = vs.toDF("v")
    val got = df.agg(sum128(col("v"))).head().getDecimal(0)
    val want = df.agg(sum(col("v").cast(
      org.apache.spark.sql.types.DecimalType(38, 0)))).head().getDecimal(0)
    assert(got.compareTo(want) == 0, s"$got != $want")
  }

  test("exceeds the long range exactly: 10k x Long.MaxValue/2") {
    val df = spark.range(10000).select(lit(Long.MaxValue / 2).as("v"))
    val got = df.agg(sum128(col("v"))).head().getDecimal(0)
    val want = new java.math.BigDecimal(Long.MaxValue / 2)
      .multiply(java.math.BigDecimal.valueOf(10000L))
    assert(got.compareTo(want) == 0, s"$got != $want")
  }

  test("negative totals past the long range") {
    val df = spark.range(10000).select(lit(Long.MinValue / 2).as("v"))
    val got = df.agg(sum128(col("v"))).head().getDecimal(0)
    val want = new java.math.BigDecimal(Long.MinValue / 2)
      .multiply(java.math.BigDecimal.valueOf(10000L))
    assert(got.compareTo(want) == 0, s"$got != $want")
  }

  test("partition-count invariant (exact merge)") {
    val vs = (1 to 5000).map(i => (i.toLong * 1000003L) *
      (if (i % 3 == 0) -1L else 1L))
    val want = vs.map(BigInt(_)).sum
    for (parts <- Seq(1, 7, 32)) {
      val got = vs.toDF("v").repartition(parts)
        .agg(sum128(col("v"))).head().getDecimal(0)
      assert(BigInt(got.toBigInteger) == want, s"parts=$parts: $got != $want")
    }
  }

  test("all-null / empty groups evaluate to 0, not NULL (documented " +
    "divergence from SQL sum)") {
    val vs: Seq[java.lang.Long] = Seq(null, null)
    val r = vs.toDF("v").agg(sum128(col("v"))).head()
    assert(!r.isNullAt(0) && r.getDecimal(0).signum == 0)
    val empty = spark.range(0).select(col("id").as("v"))
    val r2 = empty.agg(sum128(col("v"))).head()
    assert(!r2.isNullAt(0) && r2.getDecimal(0).signum == 0)
  }

  test("grouped: per-group exactness with carries") {
    val df = Seq(("a", Long.MaxValue / 2), ("a", Long.MaxValue / 2),
      ("a", 3L), ("b", -5L)).toDF("g", "v")
    val rows = df.groupBy("g").agg(sum128(col("v")).as("s"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val wantA = new java.math.BigDecimal(Long.MaxValue / 2)
      .multiply(java.math.BigDecimal.valueOf(2)).add(java.math.BigDecimal.valueOf(3))
    assert(rows("a").compareTo(wantA) == 0)
    assert(rows("b").compareTo(java.math.BigDecimal.valueOf(-5L)) == 0)
  }
}
