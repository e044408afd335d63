package graft

import org.apache.spark.sql.functions._
import graft.functions.StringOrdLongs

/** The order-preservation contract behind the window-free string
  * tiebreaks (bm25/tfidf/docTopTerms): encoded long arrays compare
  * lexicographically (signed, per long) exactly like Spark's UTF8String
  * binary order on the source strings. */
class StringOrdLongsSpec extends SparkSpec {
  import spark.implicits._

  private def cmpLongArrays(a: Seq[Long], b: Seq[Long]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = java.lang.Long.compare(a(i), b(i))
      if (c != 0) return c
      i += 1
    }
    Integer.compare(a.length, b.length)
  }

  test("property: encoding order == Spark string sort order " +
    "(ascii, digits, unicode, empty)") {
    val rnd = new scala.util.Random(13)
    val alphabet = "abcXYZ019 _-äßøπ漢字"
    val strs = (Seq("", "a", "ab", "abc", "b", "ä", "漢", "z" * 64,
      "a\u0000", "a\u0000\u0000", "a\u0000b", "\u0000") ++
      (1 to 300).map { _ =>
        val len = rnd.nextInt(12)
        (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }).distinct
    val df = strs.toDF("s")
    // Spark's own order (UTF8String binary comparison)
    val sparkOrder = df.orderBy("s").as[String].collect().toSeq
    // encoded order (ascending form = invert the stringOrdAsc longs)
    val enc = df.select(col("s"),
        StringOrdLongs.stringOrdDesc(col("s"), 8).as("e"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val encOrder = strs.sortWith((x, y) => cmpLongArrays(enc(x), enc(y)) < 0)
    assert(encOrder == sparkOrder,
      s"diverged at ${encOrder.zip(sparkOrder).indexWhere(p => p._1 != p._2)}")
    // the ascending (inverted) form is the exact mirror
    val encAsc = df.select(col("s"),
        StringOrdLongs.stringOrdAsc(col("s"), 8).as("e"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val ascOrder = strs.sortWith((x, y) => cmpLongArrays(encAsc(x), encAsc(y)) > 0)
    assert(ascOrder == sparkOrder)
  }

  test("loud failure past the byte capacity, exact at the boundary") {
    // 64 ASCII bytes fit 8 longs exactly; 65 must raise
    val ok = Seq("x" * 64).toDF("s")
      .select(StringOrdLongs.stringOrdAsc(col("s"), 8)).collect()
    assert(ok.head.getSeq[Long](0).size == 9) // 8 prefix longs + length
    val over = Seq("x" * 65).toDF("s")
      .select(StringOrdLongs.stringOrdAsc(col("s"), 8))
    val e = intercept[Exception] { over.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("string_ord_longs")))
    // multi-byte capacity is in BYTES, not chars: 22 3-byte chars = 66 bytes
    val uni = Seq("漢" * 22).toDF("s")
      .select(StringOrdLongs.stringOrdAsc(col("s"), 8))
    val e2 = intercept[Exception] { uni.collect() }
    assert(msgs(e2).exists(_.contains("string_ord_longs")))
  }
}
