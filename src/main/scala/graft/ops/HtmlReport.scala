package graft.ops

import org.apache.spark.sql.DataFrame

/** Q9 — the reference's HTML reconciliation report (`Raptor.py:142-263`
  * renders five pandas frames to HTML for an SMTP mail). Re-expressed as
  * plain string templating over bounded `take(n)` samples — a driver-side
  * side effect by nature; the SMTP hop stays out of the engine.
  *
  * Never renders unbounded frames: every section is `limit`ed before
  * collect (the reference samples with `.limit(15)` / `.limit(5)` too,
  * `Raptor.py:206-208,664-673`). */
object HtmlReport {

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** One DataFrame as an HTML table (at most `maxRows` rows collected). */
  def table(df: DataFrame, maxRows: Int = 15): String = {
    val header = df.columns.map(c => s"<th>${escape(c)}</th>")
      .mkString("<tr>", "", "</tr>")
    val rows = df.limit(maxRows).collect().map { r =>
      (0 until r.length).map { i =>
        s"<td>${escape(Option(r.get(i)).map(_.toString).getOrElse(""))}</td>"
      }.mkString("<tr>", "", "</tr>")
    }.mkString("\n")
    s"<table border=\"1\">\n$header\n$rows\n</table>"
  }

  /** Full reconciliation report: titled sections in reference order
    * (summary, column summary, column samples, extras both sides). */
  def render(title: String, result: Reconcile.DiffResult,
             sampleRows: Int = 15): String = {
    val sections = Seq(
      "Reconciliation Summary" -> result.summary,
      "Column Mismatch Summary" -> result.colSummary,
      "Column Mismatch Samples" -> result.colMismatch,
      "Rows only in Source" -> result.srcExtra,
      "Rows only in Target" -> result.tgtExtra)
    val body = sections.map { case (h, df) =>
      s"<h3>${escape(h)}</h3>\n${table(df, sampleRows)}"
    }.mkString("\n")
    s"<html><body><h2>${escape(title)}</h2>\n$body\n</body></html>"
  }
}
