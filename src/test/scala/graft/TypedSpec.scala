package graft

import graft.model.Typed

class TypedSpec extends SparkSpec {
  import spark.implicits._

  test("typed entities round-trip the canonical frames") {
    assert(Typed.suppliers(spark, sf).count() == 10)
    val p = Typed.products(spark, sf).head()
    assert(p.SELLING_PRICE > 0 && p.STOCK_QUANTITY == p.REORDER_LEVEL * 10)
    val c = Typed.customers(spark, sf).filter(_.CUSTOMER_ID == 1L).head()
    assert(c.NAME.nonEmpty)
  }

  test("typed transforms agree with the untyped pipeline") {
    // compile-checked revenue per supplier via the typed API...
    val typed = Typed.sales(spark, sf)
      .filter(_.ORDER_STATUS != "Cancelled")
      .groupByKey(_.SHIP_SUPPLIER_ID)
      .mapValues(s => s.QUANTITY)
      .reduceGroups(_ + _)
      .collect().toMap
    // ...equals the DataFrame aggregation
    val untyped = graft.model.Entities.sales(spark, sf)
      .filter($"ORDER_STATUS" =!= "Cancelled")
      .groupBy("SHIP_SUPPLIER_ID")
      .agg(org.apache.spark.sql.functions.sum("QUANTITY"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(typed.keySet == untyped.keySet)
    typed.foreach { case (k, v) => assert(v == untyped(k)) }
  }
}
