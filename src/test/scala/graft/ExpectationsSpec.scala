package graft

import org.apache.spark.sql.functions._
import graft.ops.{DuplicateException, Expectations}
import graft.ops.Expectations._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, "A", 0.02, "ok@x.io"),
    (2L, "B", 0.09, "bad-mail"),       // range + set violation
    (2L, "A", 0.01, null),             // dup key + null mail
    (3L, null, 0.00, "a@b.c")          // null flag
  ).toDF("id", "flag", "disc", "mail")

  test("row-local rules fuse into one report with exact counts") {
    val rep = Expectations.check(fixture, Seq(
      NotNull("flag_nn", "flag"),
      NotNull("mail_nn", "mail"),
      InSet("flag_domain", "flag", Seq("A")),
      InRange("disc_rng", "disc", 0.0, 0.05),
      Matches("mail_re", "mail", "[a-z]+@[a-z.]+")
    )).collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    assert(rep.forall(_._2._2 == 4L))
    assert(rep("flag_nn")._1 == 1L)
    assert(rep("mail_nn")._1 == 1L)
    assert(rep("flag_domain")._1 == 1L)  // nulls don't violate InSet
    assert(rep("disc_rng")._1 == 1L)
    assert(rep("mail_re")._1 == 1L)      // null mail doesn't violate regex
  }

  test("uniqueness counts rows in excess of one per key") {
    val rep = Expectations.check(fixture, Seq(Unique("pk", Seq("id"))))
      .collect().head
    assert(rep.getString(0) == "pk" && rep.getLong(1) == 1L &&
      rep.getLong(2) == 4L)
  }

  test("referential integrity counts absent keys over non-null probes") {
    val dim = Seq(1L, 2L).toDF("k")
    val rep = Expectations.check(fixture,
      Seq(RefIntegrity("fk", "id", dim, "k"))).collect().head
    assert(rep.getLong(1) == 1L && rep.getLong(2) == 4L) // id=3 missing
  }

  test("gate throws naming every failed rule; passes clean data through") {
    val e = intercept[DuplicateException] {
      Expectations.gate(fixture, Seq(
        NotNull("flag_nn", "flag"), Unique("pk", Seq("id"))))
    }
    assert(e.getMessage.contains("flag_nn") && e.getMessage.contains("pk"))
    val clean = fixture.filter(col("id") === 1L)
    val out = Expectations.gate(clean, Seq(NotNull("flag_nn", "flag")))
    assert(out.count() == 1L)
  }

  test("violatingRows tags each row with the rules it failed") {
    val rows = Expectations.violatingRows(fixture, Seq(
      NotNull("flag_nn", "flag"),
      InRange("disc_rng", "disc", 0.0, 0.05)))
      .select(col("id"), col("failed_rules")).collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toSet)).toMap
    assert(rows == Map(2L -> Set("disc_rng"), 3L -> Set("flag_nn")))
  }

  test("suite validation: empty suite and duplicate names rejected") {
    intercept[IllegalArgumentException] {
      Expectations.check(fixture, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Expectations.check(fixture,
        Seq(NotNull("x", "flag"), NotNull("x", "mail")))
    }
  }
}
