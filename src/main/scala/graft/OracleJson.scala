package graft

/** Serializer for the `SparkEntry.oracleSql` map — ONE escaping
  * implementation shared by [[Verify]] (the driver's correctness dump)
  * and [[Bench]] (the same-window DuckDB pairing): backslash, quote,
  * and ALL control chars (<0x20) are escaped, so a tab or CR in
  * builder-authored SQL can't make a downstream `json.load` fail. */
object OracleJson {
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def dump(m: Map[String, String]): String =
    m.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
}
