package graft

import org.apache.spark.sql.functions._
import graft.ops.IncrementalAgg

class IncrementalAggSpec extends SparkSpec {

  private def orders = spark.read.parquet(s"$sf/orders.parquet")

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap

  test("incremental merge over daily batches equals the full recompute") {
    val full = IncrementalAgg.publish(
      IncrementalAgg.initState(orders, Seq("o_orderpriority"), "o_totalprice"),
      Seq("o_orderpriority"))

    // three "days" carved deterministically from the fact table
    val batches = (0 until 3).map(d => orders.filter(col("o_orderkey") % 3 === d))
    val state0 = IncrementalAgg.initState(batches(0), Seq("o_orderpriority"), "o_totalprice")
    val state = batches.drop(1).foldLeft(state0) { (st, b) =>
      IncrementalAgg.merge(st, b, Seq("o_orderpriority"), "o_totalprice")
    }
    val incr = IncrementalAgg.publish(state, Seq("o_orderpriority"))

    assert(asMap(incr) == asMap(full))
  }

  test("merge is order-independent (backfill arrives late)") {
    val keys = Seq("o_orderpriority")
    val batches = (0 until 3).map(d => orders.filter(col("o_orderkey") % 3 === d))
    val forward = IncrementalAgg.merge(
      IncrementalAgg.merge(
        IncrementalAgg.initState(batches(0), keys, "o_totalprice"),
        batches(1), keys, "o_totalprice"),
      batches(2), keys, "o_totalprice")
    val backward = IncrementalAgg.merge(
      IncrementalAgg.merge(
        IncrementalAgg.initState(batches(2), keys, "o_totalprice"),
        batches(1), keys, "o_totalprice"),
      batches(0), keys, "o_totalprice")
    assert(asMap(IncrementalAgg.publish(forward, keys)) ==
      asMap(IncrementalAgg.publish(backward, keys)))
  }

  test("state stays key-cardinality sized") {
    val st = IncrementalAgg.initState(orders, Seq("o_orderpriority"), "o_totalprice")
    val distinctKeys = orders.select("o_orderpriority").distinct().count()
    assert(st.count() == distinctKeys)
    // and a merge does not grow it
    val merged = IncrementalAgg.merge(st, orders.limit(100), Seq("o_orderpriority"), "o_totalprice")
    assert(merged.count() == distinctKeys)
  }
}
