package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain inner join") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val part = spark.read.parquet(s"$sf/part.parquet")
      .select($"p_partkey".as("l_partkey"), $"p_name")
    val plain = li.join(part, Seq("l_partkey"))
      .select("l_orderkey", "l_partkey", "l_quantity", "p_name")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = Skew.saltedJoin(li, part, Seq("l_partkey"), 8)
      .select("l_orderkey", "l_partkey", "l_quantity", "p_name")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.length == plain.length)
    assert(salted.sameElements(plain))
  }

  test("salt spreads a hot key over the fan-out") {
    // one key, many distinct rows -> salts must not collapse to one value
    val hot = (1 to 1000).map(i => (42L, i)).toDF("k", "payload")
    val salts = hot.select(Skew.rowSalt(hot, 8)).distinct().count()
    assert(salts == 8, s"expected all 8 salt buckets used, got $salts")
  }

  test("replicated small side covers every salt so no row is lost") {
    val big = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "v")
    val small = Seq((1L, "dim1"), (2L, "dim2")).toDF("k", "d")
    val out = Skew.saltedJoin(big, small, Seq("k"), 16)
    assert(out.count() == 3)
  }
}
