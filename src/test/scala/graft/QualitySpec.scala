package graft

import org.apache.spark.sql.functions._
import graft.ops.{DuplicateException, Quality}

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("gate passes a clean primary key and returns the frame unchanged") {
    val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
    val out = Quality.gate(df, Seq("id"))
    assert(out.collect().toSet == df.collect().toSet)
  }

  test("gate throws DuplicateException on any duplicated key") {
    val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("id", "v")
    assertThrows[DuplicateException](Quality.gate(df, Seq("id")))
  }

  test("composite keys: duplicate only when all key parts repeat") {
    val df = Seq((1, "x", "a"), (1, "y", "b"), (2, "x", "c")).toDF("k1", "k2", "v")
    Quality.gate(df, Seq("k1", "k2")) // clean
    val dup = df.union(Seq((1, "x", "z")).toDF("k1", "k2", "v"))
    assertThrows[DuplicateException](Quality.gate(dup, Seq("k1", "k2")))
  }

  test("duplicates reports the offending groups with counts") {
    val df = Seq((1, "a"), (1, "b"), (1, "c"), (2, "d")).toDF("id", "v")
    val dups = Quality.duplicates(df, Seq("id")).collect()
    assert(dups.length == 1)
    assert(dups.head.getAs[Long]("cnt") == 3L)
  }

  test("orders fixture is clean on o_orderkey; lineitem is dirty on l_orderkey") {
    val o = graft.model.Entities.read(spark, sf, "orders")
    Quality.gate(o, Seq("o_orderkey"))
    val li = graft.model.Entities.read(spark, sf, "lineitem")
    assert(!Quality.duplicates(li, Seq("l_orderkey")).isEmpty)
  }
}
