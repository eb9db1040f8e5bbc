package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** The bounded-collect STRUCTURAL INVARIANT (r10, verdict item 3): every
  * `.collect()` / `.head()` / `.collectAsList()` in the operator library
  * is a driver-side action, and each one is individually sound TODAY only
  * because the frame it materializes is bounded — 1-row scalar aggregates,
  * the 1024-bucket histogram grid, |sources|- / |types|²- / k-row frames,
  * the mBits/64 bloom word table. The class has grown past 40 sites; this
  * sweep keeps it structurally sound the way BroadcastInventorySpec keeps
  * forced broadcasts sound: the per-file site count is pinned against an
  * inventory carrying the boundedness rationale, so ADDING a driver action
  * anywhere in operators/streaming requires re-stating here, in review,
  * why the collected frame cannot be corpus-proportional. (A source-scan,
  * not reflection: the sites must be found even on code paths no fixture
  * exercises — conf-gated branches, degenerate-input guards.)
  *
  * Companion gate: zero literal `repartition(n)` widths (verdict item 5) —
  * partition counts follow `numShufflePartitions` or key columns, never a
  * constant that silently under-parallelizes a 1000-executor cluster.
  */
class CollectInventorySpec extends AnyFunSuite {

  private val roots = Seq(
    "src/main/scala/graft/operators", "src/main/scala/graft/streaming")

  private def sourceFiles: Seq[java.nio.file.Path] = roots.flatMap { r =>
    Files.list(Paths.get(r)).iterator().asScala.toSeq
      .filter(_.toString.endsWith(".scala"))
  }.sortBy(_.getFileName.toString)

  /** code lines only — strip line comments and scaladoc continuation lines
    * so prose mentioning collect() never counts as a site */
  private def codeLines(p: java.nio.file.Path): Seq[String] =
    Files.readAllLines(p).asScala.toSeq
      .map(_.trim).filterNot(l => l.startsWith("//") || l.startsWith("*") || l.startsWith("/*"))

  private val action = java.util.regex.Pattern.compile(
    "\\.collect\\(\\)|\\.head\\(\\)|\\.collectAsList\\(")

  /** file -> (exact driver-action site count, boundedness rationale). */
  private val inventory: Map[String, (Int, String)] = Map(
    "FrameworkQueries.scala" -> (2,
      "1-row scalar aggregates: the statistics gate's count/countDistinct audit rows"),
    "QueriesAnn.scala" -> (4,
      "IVF cell histogram (k=16-bounded), k-row exemplar id list, two 1-row query-vector probes"),
    "QueriesCorpus.scala" -> (11,
      "1-row corpus scalars (max ts / max event_id / x50 cut row / min-max-count / " +
        "x150's budget+weight totals), k-bucket quintile and x104 histogram maps, " +
        "x146's |types|²-bounded transition matrix, x152's |sources|-row interior " +
        "stats + ≤2·buckets border runs + |sources|-row doc counts"),
    "QueriesDedup.scala" -> (4,
      "1-row scalars: max df, clustered-doc mass, wedge count, delta shingle NDV"),
    "QueriesGovernance.scala" -> (1,
      "x117's BigInt finisher over the |sources|-bounded moments frame"),
    "QueriesRelational.scala" -> (2,
      "x131 estimator: k-th order statistic of the 1/64 sample + 1-row true-rank sums " +
        "(q19's selection path is fully in-plan — zero driver actions)"),
    "QueriesShared.scala" -> (4,
      "bloom word table (mBits/64 longs), kthSmallestByHistogram's 1024-bucket grid map " +
        "+ two 1-row scalars (min/max, residual-rank max)"),
    "QueriesText.scala" -> (16,
      "the x58 corpus-stats pattern: 1-row totals pinned as literals (bm25 dl stats, " +
        "PMI/token totals, NB class stats x2 folds, CV wide totals), vocab-bounded " +
        "Misra-Gries summary row, x148/x137 fold scalars, |folds|-row CV priors, " +
        "x151's per-split (N, sum dl) stat row (one site, called per split)"),
    "RankSum.scala" -> (2,
      "1-row global (N, ties) + the |sources|-bounded per-source frame for the BigInt finisher"),
    "StreamQueries.scala" -> (6,
      "post-drain audit scalars over k-/ppm-grid-bounded state tables " +
        "(conformal nCal + threshold, drift histogram bins, MG summary map, " +
        "qs29's two 1-row index-stats rows — streamed drain + batch leg)"))

  test("collect inventory: every driver-side action site is enrolled with a boundedness rationale") {
    val found = sourceFiles.map { p =>
      val n = codeLines(p).map(l => {
        val m = action.matcher(l); var c = 0; while (m.find()) c += 1; c
      }).sum
      p.getFileName.toString -> n
    }.filter(_._2 > 0).toMap
    val unenrolled = found.keys.filterNot(inventory.contains).toSeq.sorted
    assert(unenrolled.isEmpty,
      s"files gained driver actions without an inventory rationale: " +
        unenrolled.map(f => s"$f(${found(f)})").mkString(", "))
    val drifted = inventory.collect {
      case (f, (exp, _)) if found.getOrElse(f, 0) != exp =>
        s"$f: ${found.getOrElse(f, 0)} sites (enrolled $exp)"
    }
    assert(drifted.isEmpty,
      "driver-action site counts drifted — re-review boundedness and update the inventory: " +
        drifted.mkString("; "))
  }

  test("no literal repartition width survives in operator code") {
    val literal = java.util.regex.Pattern.compile("\\.repartition\\(\\s*\\d")
    val hits = sourceFiles.flatMap { p =>
      codeLines(p).zipWithIndex.collect {
        case (l, i) if literal.matcher(l).find() => s"${p.getFileName}:${i + 1}: $l"
      }
    }
    assert(hits.isEmpty,
      s"hard-coded repartition widths (use numShufflePartitions or a key column): " +
        hits.mkString("; "))
  }
}
