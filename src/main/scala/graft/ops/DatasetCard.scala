package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset card generation — the corpus documentation artifact a data
  * release ships with (HF-style): size, per-column profile, length
  * distribution, language mix, and quality-flag rates, rendered as one
  * deterministic markdown document. Composes the existing audit
  * operators ([[Profile]], [[Histogram]], [[TextAnalysis]]) — the card
  * adds no new computation semantics, only the bounded report layer,
  * same posture as [[HtmlReport]]: every section collects a BOUNDED
  * frame (per-column stats, fixed bin counts, ≤ |langs| rows), never
  * row-scale data, and all numbers come from the same deterministic
  * operators the oracle-checked queries use — a regenerated card on
  * unchanged data is byte-identical.
  */
object DatasetCard {

  /** Cell values escape the characters that break a markdown table —
    * pipes and line breaks (the sibling [[HtmlReport.table]] escapes
    * HTML the same way); a facet value like "web|crawl" or a min_s
    * containing a newline must not split the row. */
  private def mdCell(v: Any): String =
    Option(v).map(_.toString).getOrElse("")
      .replace("\\", "\\\\").replace("|", "\\|")
      .replace("\n", "\\n").replace("\r", "\\r")

  private def mdTable(df: DataFrame, maxRows: Int = 64): String = {
    val cols = df.columns
    val header = cols.map(mdCell).mkString("| ", " | ", " |")
    val sep = cols.map(_ => "---").mkString("| ", " | ", " |")
    // over-fetch one row so truncation is DETECTED and declared — a
    // partial table silently presented as complete misreads as the full
    // distribution
    val fetched = df.limit(maxRows + 1).collect()
    val shown = fetched.take(maxRows)
    val rows = shown.map { r =>
      (0 until r.length).map(i => mdCell(r.get(i)))
        .mkString("| ", " | ", " |")
    }.mkString("\n")
    val marker =
      if (fetched.length > maxRows) s"\n\n*(first $maxRows rows shown — table truncated)*"
      else ""
    s"$header\n$sep\n$rows$marker"
  }

  /** Render the card for a documents-shaped corpus (`idCol`, `textCol`,
    * plus any categorical columns listed in `facets` get a value-count
    * section). Returns the markdown string; persisting it is the
    * caller's side effect. */
  def render(docs: DataFrame, name: String, idCol: String, textCol: String,
             facets: Seq[String] = Seq.empty, lengthBins: Int = 8): String = {
    val profiled = Profile.profile(docs,
      (Seq(idCol, textCol) ++ facets).distinct)
      .orderBy("col_name")
    val lengths = docs.select(length(col(textCol)).as("__len"))
    val lenHist = Histogram.histogramAuto(lengths, "__len", lengthBins)
      .orderBy("bin")
    val flags = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(when(TextAnalysis.contentFlags(col(textCol))
        .find(_._1 == "has_url").get._2, 1L).otherwise(0L)).as("n_url"),
      sum(when(TextAnalysis.contentFlags(col(textCol))
        .find(_._1 == "has_email").get._2, 1L).otherwise(0L)).as("n_email"),
      avg(length(col(textCol))).as("avg_chars"))
    val facetSections = facets.map { f =>
      val vc = docs.groupBy(f).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col(f))
      s"## ${f} distribution\n\n${mdTable(vc)}\n"
    }
    // NO stripMargin here: the embedded markdown tables' leading pipes
    // are content, not margins
    (Seq(
      s"# Dataset card: $name\n",
      "## Overview\n",
      mdTable(flags) + "\n",
      "## Column profile\n",
      mdTable(profiled) + "\n",
      s"## Text length distribution ($lengthBins equi-width bins)\n",
      mdTable(lenHist) + "\n") ++ facetSections).mkString("\n")
  }
}
