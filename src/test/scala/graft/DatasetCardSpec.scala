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

  test("pipes and newlines in cell values don't break table structure") {
    import spark.implicits._
    val docs = Seq((1L, "text one", "web|crawl"), (2L, "line\nbreak", "books"))
      .toDF("doc_id", "text", "source")
    val card = DatasetCard.render(docs, "weird", "doc_id", "text", Seq("source"))
    assert(card.contains("web\\|crawl"))
    assert(!card.contains("line\nbreak")) // newline escaped inside cells
    // every table row parses to a consistent pipe count per section
    val facetRows = card.linesIterator
      .dropWhile(_ != "## source distribution").filter(_.startsWith("| "))
      .toSeq
    assert(facetRows.forall(r =>
      r.count(_ == '|') - r.sliding(2).count(_ == "\\|") == 3))
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
