package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Queries

/** Counts forced broadcast hints in EVERY plan the session optimizes,
  * attributed to whichever query the sweep is currently driving. Hooked in
  * via `experimental.extraOptimizations`, so it sees construction-time
  * executions too — queries whose finishers collect driver-side (x117,
  * x144/qs28 through RankSum.audit) return a local-rows LogicalRDD whose
  * optimizedPlan is hint-free; their distributed halves run DURING
  * construction, and before this hook those hints were invisible to the
  * sweep (r10 ADVICE). Same for every eagerFinish query, whose returned
  * frame is checkpointed blocks. */
private object HintRecorder extends Rule[LogicalPlan] {
  @volatile var current: String = ""
  /** query -> distinct forced-broadcast SITE keys (r11, ADVICE): a site is
    * (side, join type, condition text with expr-ids stripped), so
    * re-optimizing the same frame in a second construction-time job no
    * longer double-counts it — ceilings stop being brittle to benign
    * re-optimization, and a REMOVED forced hint can no longer hide behind
    * an extra pass re-counting a surviving one. */
  val sites = scala.collection.concurrent.TrieMap[String, Set[String]]()
  private def condKey(j: Join): String =
    j.joinType.sql + "|" +
      j.condition.map(_.toString.replaceAll("#\\d+", "")).getOrElse("<none>")
  override def apply(plan: LogicalPlan): LogicalPlan = {
    val found = plan.collect { case j: Join =>
      Seq(("L", j.hint.leftHint, j.left), ("R", j.hint.rightHint, j.right)).collect {
        case (side, Some(h), child) if h.strategy.contains(BROADCAST) =>
          // the hinted child's output names disambiguate conditionless
          // (cross) sites that a bare condition key would collapse
          side + "|" + condKey(j) + "|" + child.output.map(_.name).mkString(",")
      }
    }.flatten
    if (found.nonEmpty)
      sites.updateWith(current)(s => Some(s.getOrElse(Set.empty) ++ found))
    plan
  }
}

/** The bounded-broadcast STRUCTURAL INVARIANT (r9, verdict item 4): every
  * forced `broadcast(...)` hint in every registered batch query must be
  * either (a) a declared bounded-domain frame — dimension tables, k-row
  * stats/centroid/model frames, vocab tables — or (b) behind a registered
  * `spark.graft.*Cap` size gate that swaps in a shuffle-side fallback past
  * the cap. A broadcast of a corpus-proportional frame is an OOM at the
  * 100 TB contract (Spark's 8 GB broadcast hard cap, driver memory), and
  * this class of flaw reached two verdicts (x130 in r7, q44/x135 in r8)
  * before becoming this CI gate.
  *
  * Mechanism (r10 rework): the sweep builds each query's DataFrame and
  * forces optimization of the returned plan, while the HintRecorder rule
  * — registered through `experimental.extraOptimizations` — counts
  * BROADCAST join-strategy hints in EVERY plan the session optimizes
  * meanwhile. Construction is NOT execution-free for this registry:
  * driver-side finishers (x117, x144 via RankSum), size-gate counts, and
  * eagerFinish checkpoints all run distributed jobs during construction,
  * and those executions carry forced hints the returned frame's own plan
  * no longer shows (it may be a bare LogicalRDD). Forced hints survive
  * optimization into the Join nodes' `JoinHint`; planner-chosen broadcasts
  * (AQE/statistics-based) are size-evidenced at runtime and intentionally
  * NOT counted — the invariant governs what the code FORCES regardless of
  * size. Any query not in the inventory must force zero broadcasts;
  * growing the inventory requires writing a bounded-domain justification
  * here, in review. Counts are DISTINCT HINT SITES (r11, ADVICE): keyed by
  * (hinted side, join type, condition text sans expr-ids), so a frame
  * re-optimized across two construction-time jobs counts once, and the
  * inventory is an EXACT match — a site appearing OR disappearing both
  * trip the sweep, so a removed hint cannot mask an added one.
  */
class BroadcastInventorySpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("broadcast-inventory-spec")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  override def afterAll(): Unit = spark.stop()

  /** name -> (max forced broadcast-hinted joins, bounded-domain rationale).
    * "conf-gated" = the hint exists only under a spark.graft.*Cap size gate
    * with a cap-0 output-identity spec proving the shuffle fallback.
    * "dup-rate" = proportional to the duplicate/near-dup population, far
    * below corpus rate by the pipelines' own contracts (gate candidates if
    * a corpus ever approaches dup-rate ≈ corpus-rate). */
  private val inventory: Map[String, (Int, String)] = Map(
    "q3_star_revenue" -> (2, "nation(25)/region(5) dimension tables"),
    "q5_theta_margin" -> (1, "k-row bucket order-statistics frame"),
    "q37_cohort_retention" -> (1, "|cohort weeks|-row size frame (bounded time dimension)"),
    "q39_merge_apply" -> (1, "conf-gated: spark.graft.merge.broadcastFeedCap"),
    "q44_ivm_join" -> (2, "conf-gated: spark.graft.ivm.broadcastDeltaCap (2 distinct delta-leg sites)"),
    "x7_ann_lsh" -> (1, "192-row hyperplane matrix"),
    "x14_ann_ivf" -> (5, "k=16 centroid frames + 5-row query frame + 5x16 query-centroid dots"),
    "x157_ivf_tombstone_serve" -> (5, "the x14 serve path verbatim: k=16 centroid frames + 5-row query frame + 5x16 query-centroid dots"),
    "x158_ivf_compaction_audit" -> (1, "k=16 centroid frame (the ivfAssigned broadcast)"),
    "x160_loo_attribution" -> (3, "|sources|-row LOO smoothing-constant frame + the conf-gated eval-pair/eval-w1 semi-filters (spark.graft.loo.broadcastEvalCap; eval set corpus-constant in production)"),
    "x21_sequence_pack" -> (1, "|packs|-row boundary frame"),
    "x27_vocabulary" -> (1, "bounded merge-rule vocabulary table"),
    "x29_quantized_rerank" -> (1, "5-row query frame"),
    "x31_doc_keywords" -> (1, "df-capped idf vocabulary"),
    "x32_lm_quality" -> (1, "bounded LM probability table"),
    "x38_kmeans_embed" -> (1, "k centroid frame: one site re-executed across the assignment rounds"),
    "x39_zorder_layout" -> (1, "k-row quantile-boundary frame"),
    "x44_textrank" -> (2, "conf-gated: spark.graft.textrank.broadcastVocabCap — vocab-bounded rank + contribution frames (round 1 needs no rank join at all: p0 is uniform, so only round 2's rank site and the shared damp site remain)"),
    "x163_packing_efficiency" -> (1, "x21's |lang x buckets|-row bucket-prefix frame, inherited via the shared offset core"),
    "x176_seqlen_curve" -> (1, "x21's |lang x buckets|-row bucket-prefix frame, inherited via the shared offset core (the x163 rationale at four lengths)"),
    "x177_novelty_forecast" -> (1, "|sources|-row doc-count frame joined onto the |sources|-row rollup"),
    "qs43_stream_novelty" -> (1, "the x177 rationale, inherited via the batch cross-check leg"),
    "x46_random_projection" -> (1, "d x k projection matrix"),
    "x48_semantic_outliers" -> (1, "k centroid frame"),
    "x49_delta_cluster_assign" -> (1, "k centroid frames"),
    "x53_imputation" -> (1, "per-column imputation-stats frame (k rows)"),
    "x54_split_manifest" -> (1, "3-row per-split totals"),
    "x56_split_contamination" -> (1, "dup-rate melted pair frame (pairEnds)"),
    "x58_bm25_retrieval" -> (1, "query-term stats frame (|query terms| rows)"),
    "x59_source_dup_matrix" -> (1, "dup-rate melted pair frame (pairEnds)"),
    "x60_winsorize" -> (1, "per-key cutoff frame (k rows)"),
    "x61_span_catalog" -> (2, "dup-rate span-hash and candidate-doc frames"),
    "x63_source_drift" -> (2, "|sources|-row moment frames"),
    "x155_loss_reweight" -> (2, "|sources|-row moment frames (inherited from the x63 core)"),
    "x154_dedup_threshold_curve" -> (1, "literal 5-row threshold-ladder frame crossed against the bounded pair frame"),
    "x67_shard_planner" -> (1, "|shards|-row boundary frame"),
    "x69_pmi_collocations" -> (2, "df-capped vocabulary frames"),
    "x70_label_cohesion" -> (2, "per-label centroid frames (|labels| rows)"),
    "x76_pack_manifest" -> (1, "|packs|-row boundary frame"),
    "x78_vocab_coverage" -> (1, "top-k vocabulary table"),
    "x79_length_drift_ks" -> (2, "bounded per-source CDF grid frames"),
    "x84_whitened_ann" -> (1, "d x d whitening matrix + query frame"),
    "x88_semdedup" -> (1, "k-row centroid frame: ONE distinct site, re-executed across the k-means rounds (the r10 sum of 16 was re-optimization double-counting)"),
    "x98_contrastive_pairs" -> (1, "k-row sampled anchor frame"),
    "x101_knn_classify" -> (1, "k-row labeled anchor frame"),
    "x102_pq_codebook" -> (1, "k x d codebook frames"),
    "x108_nb_quality_classifier" -> (1, "vocab-capped NB model frame"),
    "x110_ivm_dedup_index" -> (2, "conf-gated: spark.graft.dedup.broadcastDirtyCap (both legs)"),
    "x115_bitext_pairs" -> (1, "bounded language-pair table"),
    "x119_erasure_audit" -> (1, "conf-gated: spark.graft.erasure.broadcastSubjectCap"),
    "x122_hybrid_rrf" -> (2, "1-row query embedding + 100-row fused lists"),
    "x124_markov_eval" -> (1, "|event types|^2 transition matrix"),
    "x126_minhash_scorecard" -> (2, "dup-rate pair-member id set + melted pair frame (pairEnds)"),
    "x128_reliability_audit" -> (1, "bounded calibration-bin frame"),
    "x130_ivm_components" -> (3, "conf-gated delta shingles (broadcastShingleCap) + affected-component relabel map; +1 construction-time execution recorded by the r10 hook"),
    "x133_target_encoding" -> (1, "|categories|-row totals frame"),
    "x135_semantic_split_leak" -> (1, "conf-gated: spark.graft.splitleak.broadcastTestCap"),
    "x139_retrieval_ndcg" -> (3, "pinned 20-row DCG/rank tables + query-term stats (one re-optimized in a construction-time stats job)"),
    "x140_cv_model_select" -> (2, "5-row fold-total + model frames"),
    "x145_ranker_tau" -> (3, "top-k ranker list frames (k rows each): 3 distinct sites across the construction-time scalar jobs"),
    "x148_conformal_proper" -> (1, "fold-trained NB model frame (vocab-sized, the x108 class)"),
    // r10: counts below exist only through the extraOptimizations hook —
    // these queries' distributed halves run at CONSTRUCTION (driver-side
    // finishers, eagerFinish checkpoints, iteration rounds) and their
    // returned frames are hint-free LogicalRDD/checkpoint plans
    "x45_cluster_exemplars" -> (1, "k centroid frames (assignment + exemplar rank)"),
    "x112_pq_index_serve" -> (4, "k x d codebook + 5-row query frames across the train->encode->publish->serve lifecycle executions"),
    "x123_bradley_terry" -> (6, "per-round broadcasts of the |items|^2-bounded pair/strength frames: 6 distinct sites, re-executed across the 4 checkpoint-leaf MM rounds (r12 opt dropped the normalizer crossJoin-broadcast site — it is a single-partition window now)"),
    "x137_conformal_gate" -> (1, "x108's vocab-capped NB model frame, executed at construction via eagerFinish"),
    "x143_ivf_probe_ladder" -> (4, "k=16 centroid + 5-row query/crank frames, executed at construction via eagerFinish"),
    "x144_rank_sum_drift" -> (1, "RankSum's ppm-grid-bounded pooled midrank table (the r10 ADVICE item)"),
    "qs28_stream_rank_drift" -> (1, "RankSum's pooled midrank table, post-drain audit"),
    "x151_bm25_stats_ivm" -> (1, "|query terms|-row (3) idf frame: one site shared by maintained + rebuilt legs"),
    "qs29_stream_bm25_stats" -> (1, "|query terms|-row (3) idf frame: one site shared by the streamed-stats + batch-stats serve legs"),
    "x149_ivf_delta_add" -> (3, "k=16 centroid frames (base+delta assignment, probe rank) + 5-row query frame + |q|x4 probe set"))

  test("every forced broadcast in every batch query is a declared bounded frame or conf-gated") {
    spark.experimental.extraOptimizations ++= Seq(HintRecorder)
    val violations = Queries.all.flatMap { q =>
      HintRecorder.current = q.name
      try {
        val df = q.run(spark, sf)
        df.queryExecution.optimizedPlan // returned plan counts too
      } finally {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
      val forced = HintRecorder.sites.get(q.name).map(_.size).getOrElse(0)
      val cap = inventory.get(q.name).map(_._1).getOrElse(0)
      if (forced != cap)
        Some(s"${q.name}: $forced distinct forced-broadcast site(s), declared $cap\n  " +
          HintRecorder.sites.getOrElse(q.name, Set.empty)
            .toSeq.sorted.map(_.take(120)).mkString("\n  "))
      else None
    }
    assert(violations.isEmpty,
      "undeclared forced broadcasts (enroll with a bounded-domain rationale, " +
        "or size-gate them behind a spark.graft.*Cap):\n" + violations.mkString("\n"))
  }
}
