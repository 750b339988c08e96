package graft.tools

/** Print `SparkEntry.oracleSql` as JSON to stdout (optionally only
  * the comma-separated names in args(0)) — lets the DuckDB side of an
  * oracle be syntax-checked without starting a SparkSession.
  */
object DumpOracles {
  private def esc(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c    => c.toString
    }

  def main(args: Array[String]): Unit = {
    val only: Option[Set[String]] =
      args.headOption.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val sqls = graft.SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
    println(sqls.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{", ",\n", "}"))
  }
}
