package graft

import org.apache.spark.sql.functions._
import graft.ops.Composition

class TopMassSpec extends SparkSpec {
  import spark.implicits._

  test("threshold covers exactly the top-p mass on a hand-checked group") {
    // weights 10,9,8,...,1: total 55, need(1/2) = 28; top-down 10+9+8 = 27,
    // +7 = 34 >= 28 → threshold 7, kept mass 34
    val df = (1 to 10).map(i => ("g", i.toLong)).toDF("k", "w")
    val th = Composition.topMassThresholds(df, "k", "w", 1L, 2L).head()
    assert(th.getAs[Long]("threshold") == 7L)
    assert(th.getAs[Long]("need") == 28L)
    assert(th.getAs[Long]("total") == 55L)
    val kept = Composition.selectTopMass(df, "k", "w", 1L, 2L)
      .agg(sum("w")).head().getLong(0)
    assert(kept == 34L)
  }

  test("ties collapse honestly: all rows at the threshold value stay") {
    val df = Seq(("g", 5L), ("g", 5L), ("g", 5L), ("g", 1L)).toDF("k", "w")
    // total 16, need(1/2) = 8; mass at w=5 is 15 >= 8 → threshold 5
    val kept = Composition.selectTopMass(df, "k", "w", 1L, 2L).collect()
    assert(kept.length == 3)
    assert(kept.forall(_.getAs[Long]("w") == 5L))
  }

  test("p = 1 keeps everything; per-group thresholds are independent") {
    val df = Seq(("a", 100L), ("a", 1L), ("b", 3L), ("b", 2L)).toDF("k", "w")
    assert(Composition.selectTopMass(df, "k", "w", 1L, 1L).count() == 4L)
    val th = Composition.topMassThresholds(df, "k", "w", 4L, 5L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("threshold")).toMap
    // a: total 101, need 81 → 100 alone covers → threshold 100
    // b: total 5, need 4 → 3 alone < 4, +2 = 5 → threshold 2
    assert(th("a") == 100L)
    assert(th("b") == 2L)
  }

  test("matches a driver-side cumsum oracle on the fixture") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val got = Composition
      .topMassThresholds(docs, "source", "n_chars", 4L, 5L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("threshold")).toMap
    val bySource = docs.select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    bySource.foreach { case (src, rows) =>
      val ws = rows.map(_._2).sortBy(-_)
      val total = ws.sum
      val need = (total * 4 + 4) / 5 // ceil(total*4/5)
      // largest w with mass-at-or-above >= need (value-closed set)
      val distinctDesc = ws.distinct
      val thr = distinctDesc.find(w => ws.filter(_ >= w).sum >= need).get
      assert(got(src) == thr, s"source $src")
    }
  }

  test("rejects negative weights and degenerate fractions") {
    val df = Seq(("g", -1L)).toDF("k", "w")
    intercept[IllegalArgumentException] {
      Composition.topMassThresholds(df, "k", "w", 1L, 2L).collect()
    }
    intercept[IllegalArgumentException] {
      Composition.topMassThresholds(df, "k", "w", 3L, 2L)
    }
  }
}
