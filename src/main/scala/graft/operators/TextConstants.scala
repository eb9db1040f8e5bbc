package graft.operators

/** Initialization-order-neutral text constants: referenced from BOTH
  * `Queries` (via QueriesText) and `StreamQueries` during their object
  * init. Constants must live OUTSIDE both registries — a cross-registry
  * reference during init deadlocks the mutual `Queries.all ⇄
  * StreamQueries.all` clinit (observed: qs27Sql reading
  * Queries.stopwordsSqlList aborted the whole streaming registry). */
object TextConstants {
  /** x8's stopword list — the single source for the quality kernels and
    * every oracle's `IN (...)` literal. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  val stopwordsSqlList: String = stopwords.map(s => s"'$s'").mkString(", ")
  val stopwordsArrayExpr: String = stopwords.map(s => s"'$s'").mkString("array(", ", ", ")")
}
