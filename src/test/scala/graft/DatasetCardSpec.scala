package graft

import org.apache.spark.sql.functions._
import graft.ops.DatasetCard

class DatasetCardSpec extends SparkSpec {

  test("card renders every section with numbers matching direct queries") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val card = DatasetCard.render(docs, "fixture-docs", "doc_id", "text",
      facets = Seq("lang", "source"))
    assert(card.contains("# Dataset card: fixture-docs"))
    Seq("## Overview", "## Column profile", "## Text length distribution",
      "## lang distribution", "## source distribution")
      .foreach(h => assert(card.contains(h), h))
    // overview row carries the corpus size
    assert(card.contains(s"| ${docs.count()} |"))
    // every language appears in the facet section
    docs.select("lang").distinct().collect().map(_.getString(0))
      .foreach(l => assert(card.contains(s"| $l |"), l))
  }

  test("regenerating on unchanged data is byte-identical") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def gen() = DatasetCard.render(docs, "x", "doc_id", "text", Seq("lang"))
    assert(gen() == gen())
    // and under a different partitioning — the operators underneath are
    // the deterministic ones, so the CARD is layout-invariant too
    val repartitioned = docs.repartition(7)
    assert(gen() == DatasetCard.render(repartitioned, "x", "doc_id", "text",
      Seq("lang")))
  }
}
