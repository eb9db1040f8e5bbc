package graft

/** Renders docs/QUERIES.md from the live registry so the reference table
  * can never drift from the code: one row per registered query with its
  * one-line contract and oracle status. Run: `sbt "runMain graft.DocGen"`
  * (round closes regenerate it; a stale table shows up as a git diff). */
object DocGen {
  def main(args: Array[String]): Unit = {
    val qs = graft.operators.Queries.all
    val groups = Seq(
      "q" -> "Relational / warehouse (Q-series)",
      "qs" -> "Streaming (QS-series)",
      "x" -> "LLM-data-pipeline & governance (X-series)")
    val sb = new StringBuilder
    sb ++= "# Query reference (generated — do not edit)\n\n"
    sb ++= s"`graft.DocGen` renders this from `Queries.all`: ${qs.size} queries, "
    sb ++= s"${qs.count(_.oracle.isDefined)} with DuckDB oracles.\n"
    for ((prefix, title) <- groups) {
      val rows = qs.filter { q =>
        val p = q.name.takeWhile(!_.isDigit)
        if (prefix == "q") p == "q" else p == prefix
      }.sortBy { q =>
        val digits = q.name.drop(prefix.length).takeWhile(_.isDigit)
        (if (digits.isEmpty) 0 else digits.toInt, q.name)
      }
      sb ++= s"\n## $title (${rows.size})\n\n| query | contract | oracle |\n|---|---|---|\n"
      rows.foreach { q =>
        sb ++= s"| `${q.name}` | ${q.doc} | ${if (q.oracle.isDefined) "hash-gated" else "rows-only"} |\n"
      }
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("docs/QUERIES.md"),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"docs/QUERIES.md: ${qs.size} queries")
  }
}
