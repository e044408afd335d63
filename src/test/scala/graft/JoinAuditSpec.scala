package graft

import org.apache.spark.sql.functions._
import graft.ops.JoinAudit

class JoinAuditSpec extends SparkSpec {
  import spark.implicits._

  test("predicted rows equal the actual inner-join cardinality") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val audit = JoinAudit.joinFanout(o, l, Seq("o_orderkey")).head()
    val actual = o.join(l, "o_orderkey").count()
    assert(BigDecimal(audit.getDecimal(1)) == BigDecimal(actual))
  }

  test("hot key dominates max_key_fanout and skew_ratio") {
    val left = (Seq.fill(10)(1L) ++ Seq(2L, 3L)).toDF("k")
    val right = (Seq.fill(10)(1L) ++ Seq(2L, 3L)).toDF("k")
    val a = JoinAudit.joinFanout(left, right, Seq("k")).head()
    assert(a.getAs[Long]("matched_keys") == 3L)
    assert(BigDecimal(a.getDecimal(1)) == BigDecimal(102)) // 100 + 1 + 1
    assert(BigDecimal(a.getDecimal(2)) == BigDecimal(100))
    // 100 / (102/3) ≈ 2.94 average-keys of weight on the hot key
    assert(math.abs(a.getAs[Double]("skew_ratio") - 100.0 / (102.0 / 3)) < 1e-12)
  }

  test("null keys are excluded like the equi-join would") {
    val left = Seq(Some(1L), None, None).toDF("k")
    val right = Seq(Some(1L), None).toDF("k")
    val f = JoinAudit.keyFanout(left, right, Seq("k")).collect()
    assert(f.length == 1 && f.head.getAs[Long]("left_n") == 1L)
  }
}
