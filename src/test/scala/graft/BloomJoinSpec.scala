package graft

import org.apache.spark.sql.functions._
import graft.ops.BloomJoin

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloomAntiJoin equals the plain left-anti join on fixture tables") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_name")
    val ordersF = spark.read.parquet(s"$sf/orders.parquet")
      .filter($"o_orderstatus" === "F").select("o_custkey")
    val plain = cust.join(ordersF, $"c_custkey" === $"o_custkey", "left_anti")
      .collect().map(_.toSeq).sortBy(_.toString)
    val bloomed = BloomJoin.bloomAntiJoin(cust, ordersF, "c_custkey", "o_custkey")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(bloomed.sameElements(plain))
  }

  test("an undersized (high-fpp) filter still yields the exact result") {
    // expectedItems=8 against thousands of keys drives fpp toward 1 —
    // nearly every probe lands in the verify branch, and the answer must
    // not change (false positives cost work, never correctness)
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_name")
    val ordersF = spark.read.parquet(s"$sf/orders.parquet")
      .filter($"o_orderstatus" === "F").select("o_custkey")
    val plain = cust.join(ordersF, $"c_custkey" === $"o_custkey", "left_anti")
      .collect().map(_.toSeq).sortBy(_.toString)
    val bloomed = BloomJoin.bloomAntiJoin(cust, ordersF, "c_custkey", "o_custkey",
        expectedItems = 8L, fpp = 0.5)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(bloomed.sameElements(plain))
  }

  test("bloomSemiJoin equals the plain left-semi join") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_name")
    val ordersF = spark.read.parquet(s"$sf/orders.parquet")
      .filter($"o_orderstatus" === "F").select("o_custkey")
    val plain = cust.join(ordersF, $"c_custkey" === $"o_custkey", "left_semi")
      .collect().map(_.toSeq).sortBy(_.toString)
    val bloomed = BloomJoin.bloomSemiJoin(cust, ordersF, "c_custkey", "o_custkey")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(bloomed.sameElements(plain))
  }

  test("string keys and null keys follow SQL join semantics") {
    val left = Seq(Some("a"), Some("b"), Some("c"), None)
      .toDF("k").withColumn("v", monotonically_increasing_id())
    val right = Seq(Some("b"), Some("c"), None).toDF("rk")
    // anti: null-key row KEPT (null matches nothing); semi: null DROPPED
    val anti = BloomJoin.bloomAntiJoin(left, right, "k", "rk")
      .select("k").collect().map(_.getString(0)).toSet
    assert(anti == Set("a", null))
    val semi = BloomJoin.bloomSemiJoin(left, right, "k", "rk")
      .select("k").collect().map(_.getString(0)).toSet
    assert(semi == Set("b", "c"))
  }

  test("the definite-negative branch bypasses the join (pruning is real)") {
    // a right side disjoint from the left: a correctly-sized bloom sends
    // (almost) every row down the no-shuffle branch; assert the result is
    // the whole left — and that the verify join saw at most fpp·|left|
    val left = (1L to 1000L).toDF("k")
    val right = (100001L to 100100L).toDF("rk")
    val bytes = BloomJoin.buildFilter(right, "rk", 1000L, 0.01)
    val maybes = left
      .filter(graft.functions.BloomMightContain.mightContain($"k", bytes)).count()
    assert(maybes <= 50, s"expected ≈1% false positives, got $maybes of 1000")
    val out = BloomJoin.bloomAntiJoin(left, right, "k", "rk", 1000L, 0.01)
    assert(out.count() == 1000)
  }
}
