package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-governance & experimentation queries (r7, SURVEY §2.4 X104–X106):
  * the release-side operations a training-data platform runs BEFORE data
  * leaves the house — privacy audits (k-anonymity/l-diversity), an
  * ε-differential-privacy release pipeline shape, and deterministic A/B
  * significance testing on the event stream. Split from the corpus-prep
  * family because the consumer is a release/compliance gate, not a
  * training run.
  *
  * Members are `private[operators]` and mix into [[Queries]] (self-typed);
  * SQL oracles are lazy (initialization-order-safe across traits).
  */
private[operators] trait QueriesGovernance { this: Queries.type =>

  // ---------------------------------------------------------------- X116
  /** K-ANONYMITY / L-DIVERSITY RELEASE AUDIT — the privacy scorecard run
    * before a corpus (or its metadata) is shared: treat (lang,
    * 100-char length bucket) as the QUASI-IDENTIFIER — the attributes an
    * adversary can observe externally — and `source` as the sensitive
    * attribute. A QI equivalence class of size < k re-identifies its
    * members by intersection (k-anonymity, Sweeney 2002); a class whose
    * members all share one sensitive value leaks it even at size ≥ k
    * (l-diversity, Machanavajjhala 2007). Output is the class-size
    * HISTOGRAM — one row per class size with how many classes/documents
    * sit there, the worst l-diversity at that size, and the k=5 flag —
    * the shape a release checklist reads directly ("how much of the
    * corpus sits in classes smaller than 5?"). Scale: two map-side-
    * combined aggregations, the second over |classes| rows (bounded by
    * the QI domain, never the corpus); no windows, no joins. */
  private[operators] def x116(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), expr("n_chars div 100").as("len_bucket"), col("source"))
      .groupBy(col("lang"), col("len_bucket"))
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col("source")).as("l_div"))
      .groupBy(col("class_size"))
      .agg(count(lit(1)).as("n_classes"), min(col("l_div")).as("min_l_diversity"))
      .withColumn("n_docs", col("class_size") * col("n_classes"))
      .withColumn("meets_k5", col("class_size") >= 5)
      .select(col("class_size"), col("n_classes"), col("n_docs"),
        col("min_l_diversity"), col("meets_k5"))

  private[operators] lazy val x116Sql =
    """WITH c AS (SELECT lang, n_chars // 100 AS len_bucket,
      |    CAST(count(*) AS BIGINT) AS class_size,
      |    CAST(count(DISTINCT source) AS BIGINT) AS l_div
      |  FROM documents GROUP BY 1, 2)
      |SELECT class_size, CAST(count(*) AS BIGINT) AS n_classes,
      |  CAST(class_size * count(*) AS BIGINT) AS n_docs,
      |  CAST(min(l_div) AS BIGINT) AS min_l_diversity,
      |  class_size >= 5 AS meets_k5
      |FROM c GROUP BY class_size""".stripMargin

  // ---------------------------------------------------------------- X117
  /** DETERMINISTIC A/B TEST (Welch's t) — the experimentation readout
    * over the event stream: units (users) are assigned to arms by a
    * CONTENT-ADDRESSED hash (md5(user_id) % 2 — the x54 split
    * discipline: the same user lands in the same arm on every run,
    * every engine, and assignment is independent of row order), and per
    * event type the two arms' `value` distributions are compared with
    * Welch's unequal-variance t statistic. Exactness discipline: values
    * quantize to integer cents ONCE; n/Σ/Σ² per arm are EXACT int64
    * sums (order-free); means are exposed as exact integer micro-cents
    * (half-up rationals); t² (r8) is the EXACT integer rational
    * D²(m−1)(n−1) / [A·n²(n−1) + B·m²(m−1)] with A = m·Σx²−(Σx)²,
    * B likewise, D = n·Σx_a − m·Σx_b — micro-quantized half-up in
    * DECIMAL(38,0)/HUGEINT, and the significance flag is the pure
    * integer comparison 10⁶·Num > 3841459·Den (χ²₁ at α=0.05), so
    * neither can drift across engines. The moment cross-products are
    * finished DRIVER-SIDE in exact BigInt over the |event_types|-row
    * frame (r9, the RankSum/x146 class): worst-case dd is RANGE-sized
    * (≈ n²·cmax), so 2·10⁶·dd²·n²-class products clear 38 digits at a
    * few thousand rows/arm — and Spark silently NULLs on decimal
    * overflow where DuckDB HUGEINT raises, a silent engine/oracle
    * divergence. BigInt has no ceiling; what stays distributed is the
    * corpus scan and the int64-exact moment sums (safe while n·c² <
    * 2⁶³, the documented contract). The Welch–Satterthwaite df is the
    * one REMAINING double round (so x117 stays in RoundBoundarySpec):
    * an exact df needs (P+Q)² ≈ 10⁵⁵-digit integers — irreducible, not
    * unmigrated; the driver mirrors Spark's exact IEEE order and
    * HALF_UP round so the migration is value-invisible. Scale: one
    * corpus scan, one |event_types|-row aggregation with 6 conditional
    * sums riding it map-side — the moment algebra never shuffles more
    * than k rows. */
  /** the distributed half of x117 — exposed so PlansSpec can keep gating
    * the one-scan/map-side-combine property after the finisher moved
    * driver-side */
  /** the per-row prep + ONE wide aggregation, frame-based so the qs36
    * streaming twin runs the identical core (the qs26/foldMomentsWide
    * pattern): 6 commutative conditional sums, |event_types|-row state. */
  private[graft] def abMoments(ev: DataFrame): DataFrame =
    ev.filter(col("value").isNotNull)
      .select(col("event_type"),
        pmod(conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
          .cast(LongType), lit(2L)).as("arm"),
        expr("cast(round(value * 100, 0) as bigint)").as("cents"))
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === 0, col("cents")).otherwise(0L)).as("s_a"),
        sum(when(col("arm") === 1, col("cents")).otherwise(0L)).as("s_b"),
        sum(when(col("arm") === 0, col("cents") * col("cents")).otherwise(0L)).as("ss_a"),
        sum(when(col("arm") === 1, col("cents") * col("cents")).otherwise(0L)).as("ss_b"))
      .filter(col("n_a") > 1 && col("n_b") > 1)

  private[graft] def x117Moments(spark: SparkSession, dir: String): DataFrame =
    abMoments(Tables.events(spark, dir))

  /** the driver-side BigInt finisher over a |event_types|-row moment
    * frame (drained OR batch — qs36 feeds it the recovered stream state). */
  private[graft] def x117Finish(spark: SparkSession, moments: DataFrame): DataFrame = {
    val rows = moments.collect().map { r =>
      val et = r.getString(0)
      val na = r.getLong(1); val nb = r.getLong(2)
      val sa = r.getLong(3); val sb = r.getLong(4)
      val ssa = r.getLong(5); val ssb = r.getLong(6)
      val aa = BigInt(na) * ssa - BigInt(sa) * sa
      val bb = BigInt(nb) * ssb - BigInt(sb) * sb
      val dd = BigInt(nb) * sa - BigInt(na) * sb
      val tnum = dd * dd * (na - 1) * (nb - 1)
      val tden = aa * nb * nb * (nb - 1) + bb * na * na * (na - 1)
      val t2: java.lang.Long =
        if (tden == 0) null
        else java.lang.Long.valueOf(((2 * tnum * 1000000 + tden) / (2 * tden)).toLong)
      // the audited double round, in Spark's exact IEEE op order
      val va = (ssa.toDouble - sa.toDouble * sa / na) / (na - 1)
      val vb = (ssb.toDouble - sb.toDouble * sb / nb) / (nb - 1)
      val se2 = va / na + vb / nb
      val dfRaw = se2 * se2 / ((va / na) * (va / na) / (na - 1)
        + (vb / nb) * (vb / nb) / (nb - 1)) * 1000000.0
      val dfm: java.lang.Long =
        if (dfRaw.isNaN || dfRaw.isInfinite) null
        else java.lang.Long.valueOf(BigDecimal(dfRaw)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      Row(et, na, nb,
        ((2 * BigInt(sa) * 1000000 + na) / (2 * BigInt(na))).toLong,
        ((2 * BigInt(sb) * 1000000 + nb) / (2 * BigInt(nb))).toLong,
        t2, dfm, tnum * 1000000 > 3841459 * tden)
    }
    val schema = StructType(Seq(
      moments.schema.fields.head,
      StructField("n_a", LongType, nullable = false),
      StructField("n_b", LongType, nullable = false),
      StructField("mean_a_microcents", LongType, nullable = false),
      StructField("mean_b_microcents", LongType, nullable = false),
      StructField("t2_micros", LongType, nullable = true),
      StructField("df_micros", LongType, nullable = true),
      StructField("significant", BooleanType, nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  private[operators] def x117(spark: SparkSession, dir: String): DataFrame =
    x117Finish(spark, x117Moments(spark, dir))

  private[operators] lazy val x117Sql =
    """WITH e AS (SELECT event_type,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS arm,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE value IS NOT NULL),
      |m AS (SELECT event_type,
      |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(sum(CASE WHEN arm = 0 THEN cents ELSE 0 END) AS BIGINT) AS s_a,
      |    CAST(sum(CASE WHEN arm = 1 THEN cents ELSE 0 END) AS BIGINT) AS s_b,
      |    CAST(sum(CASE WHEN arm = 0 THEN cents * cents ELSE 0 END) AS BIGINT) AS ss_a,
      |    CAST(sum(CASE WHEN arm = 1 THEN cents * cents ELSE 0 END) AS BIGINT) AS ss_b
      |  FROM e GROUP BY event_type),
      |v AS (SELECT *,
      |    CAST(n_a AS HUGEINT) * ss_a - CAST(s_a AS HUGEINT) * s_a AS aa,
      |    CAST(n_b AS HUGEINT) * ss_b - CAST(s_b AS HUGEINT) * s_b AS bb,
      |    CAST(n_b AS HUGEINT) * s_a - CAST(n_a AS HUGEINT) * s_b AS dd,
      |    (CAST(ss_a AS DOUBLE) - CAST(s_a AS DOUBLE) * s_a / n_a) / (n_a - 1) AS va,
      |    (CAST(ss_b AS DOUBLE) - CAST(s_b AS DOUBLE) * s_b / n_b) / (n_b - 1) AS vb
      |  FROM m WHERE n_a > 1 AND n_b > 1),
      |w AS (SELECT *,
      |    dd * dd * (n_a - 1) * (n_b - 1) AS tnum,
      |    aa * n_b * n_b * (n_b - 1) + bb * n_a * n_a * (n_a - 1) AS tden,
      |    va / n_a + vb / n_b AS se2 FROM v)
      |SELECT event_type, n_a, n_b,
      |  (2 * s_a * 1000000 + n_a) // (2 * n_a) AS mean_a_microcents,
      |  (2 * s_b * 1000000 + n_b) // (2 * n_b) AS mean_b_microcents,
      |  CAST((2 * tnum * 1000000 + tden) // (2 * tden) AS BIGINT) AS t2_micros,
      |  CAST(round(se2 * se2 / ((va / n_a) * (va / n_a) / (n_a - 1)
      |    + (vb / n_b) * (vb / n_b) / (n_b - 1)) * 1000000.0, 0) AS BIGINT) AS df_micros,
      |  tnum * 1000000 > 3841459 * tden AS significant
      |FROM w""".stripMargin

  // ---------------------------------------------------------------- X118
  /** ε-DIFFERENTIAL-PRIVACY RELEASE PIPELINE (Laplace mechanism) — the
    * noisy-histogram release shape (Dwork 2006): per-event-type counts
    * get Laplace(Δ/ε) noise (Δ = 1, ε = 1) before publication. The noise
    * draw is CONTENT-ADDRESSED — u = md5(event_type ‖ release-tag) as a
    * uniform in (0,1), inverse-CDF'd to Laplace — so the release is
    * reproducible and oracle-checkable. HONESTY NOTE (the x13/x51
    * stub-discipline): deriving noise from the data's own key is NOT
    * differentially private (the draw must be secret and fresh per
    * release); what this query demonstrates — and what the engine is
    * responsible for at 100 TB — is the release PIPELINE: exact counts,
    * a per-class noise column, integer-quantized publication values, and
    * the ε accounting column a privacy-budget ledger would ingest.
    * Swapping `u` for a secure RNG changes one expression. Exactness:
    * the inverse-CDF is ONE ln-bearing expression quantized once to
    * int64 micros (the x63 single-transcendental recipe); the published
    * value is then pure integer arithmetic. Scale: one aggregation,
    * |event_types| rows, noise map-side on the k-row result. */
  private[operators] def x118(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("true_count"))
      // u in (0,1): 48-bit hash + half-bit offset (the x47 skey recipe —
      // never exactly 0 or 1, so ln(1-2|u-1/2|) is finite)
      .withColumn("u", expr(
        "(conv(substring(md5(concat(event_type, ':release1')), 1, 12), 16, 10)" +
          " + 0.5) / 281474976710656.0"))
      .withColumn("noise_micros", round(expr(
        "(case when u >= 0.5 then -1.0 else 1.0 end) * ln(1.0 - 2.0 * abs(u - 0.5))")
        * lit(1000000.0), 0).cast(LongType))
      .withColumn("noisy_count_micros", col("true_count") * lit(1000000L) + col("noise_micros"))
      .withColumn("epsilon_micros", lit(1000000L))
      .select(col("event_type"), col("true_count"), col("noise_micros"),
        col("noisy_count_micros"), col("epsilon_micros"))

  // ---------------------------------------------------------------- X120
  /** DATA-CONTRACT EXPECTATION SUITE — the Great-Expectations shape as
    * ONE declarative query: a battery of named column expectations over
    * the fact table (non-null, domain range, value-set membership,
    * compound-key uniqueness, referential integrity), each reported as
    * (expectation, n_checked, n_violations, pass). This is the contract
    * a producer would wire into `validateOutputs` (F13) — the query form
    * exists so the SAME battery can audit tables the engine didn't
    * write. Scale shape: the five row-local expectations ride ONE corpus
    * scan as conditional sums (map-side combined, zero extra passes);
    * uniqueness is one keyed aggregation counting duplicate key groups;
    * the FK check is a broadcast-able anti-join against the distinct
    * parent keys. Nothing is corpus² and nothing lands on the driver. */
  private[operators] def x120(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val n = li.count()
    def row(name: String, violations: org.apache.spark.sql.Column): DataFrame =
      li.agg(violations.cast(LongType).as("n_violations"))
        .select(lit(name).as("expectation"), lit(n).as("n_checked"),
          col("n_violations"), (col("n_violations") === 0L).as("pass"))
    val rowLocal = row("quantity_in_1_50",
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L).otherwise(0L)))
      .unionByName(row("shipdate_not_null",
        sum(when(col("l_shipdate").isNull, 1L).otherwise(0L))))
      .unionByName(row("discount_in_0_01",
        sum(when(col("l_discount") < 0.0 || col("l_discount") > 0.1, 1L).otherwise(0L))))
      .unionByName(row("returnflag_in_set",
        sum(when(!col("l_returnflag").isInCollection(Seq("A", "N", "R")), 1L).otherwise(0L))))
      .unionByName(row("price_positive",
        sum(when(col("l_extendedprice") <= 0.0, 1L).otherwise(0L))))
    val dupKeys = li.groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1)
      .agg(coalesce(sum(col("c")), lit(0L)).as("n_violations"))
      .select(lit("orderkey_linenumber_unique").as("expectation"),
        lit(n).as("n_checked"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
    val orphan = li.join(Tables.orders(spark, dir)
        .select(col("o_orderkey").as("l_orderkey")).distinct(),
        Seq("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("orderkey_references_orders").as("expectation"),
        lit(n).as("n_checked"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
    rowLocal.unionByName(dupKeys).unionByName(orphan)
  }

  private[operators] lazy val x120Sql =
    """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem)
      |SELECT 'quantity_in_1_50' AS expectation, (SELECT n FROM n) AS n_checked,
      |  CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_violations,
      |  sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) = 0 AS pass
      |FROM lineitem
      |UNION ALL
      |SELECT 'shipdate_not_null', (SELECT n FROM n),
      |  CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) = 0
      |FROM lineitem
      |UNION ALL
      |SELECT 'discount_in_0_01', (SELECT n FROM n),
      |  CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT),
      |  sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END) = 0
      |FROM lineitem
      |UNION ALL
      |SELECT 'returnflag_in_set', (SELECT n FROM n),
      |  CAST(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS BIGINT),
      |  sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END) = 0
      |FROM lineitem
      |UNION ALL
      |SELECT 'price_positive', (SELECT n FROM n),
      |  CAST(sum(CASE WHEN l_extendedprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT),
      |  sum(CASE WHEN l_extendedprice <= 0.0 THEN 1 ELSE 0 END) = 0
      |FROM lineitem
      |UNION ALL
      |SELECT 'orderkey_linenumber_unique', (SELECT n FROM n),
      |  CAST(coalesce(sum(c), 0) AS BIGINT), coalesce(sum(c), 0) = 0
      |FROM (SELECT count(*) AS c FROM lineitem
      |      GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)
      |UNION ALL
      |SELECT 'orderkey_references_orders', (SELECT n FROM n),
      |  CAST(count(*) AS BIGINT), count(*) = 0
      |FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)""".stripMargin

  // ---------------------------------------------------------------- X119
  /** RIGHT-TO-ERASURE AUDIT (GDPR art. 17 / CCPA deletion) — given a
    * data-subject tombstone set, measure what a deletion job must touch
    * across the WAREHOUSE, not one table: rows carrying the subject id
    * directly (customer, orders, events) plus the REFERENTIAL CASCADE
    * (lineitem rows reachable only through an erased customer's orders —
    * the rows a naive per-table delete misses). Output is the per-table
    * deletion plan: row count, distinct subjects present, and whether
    * the path is direct or a cascade. The tombstone set here is the
    * deterministic fixture `user_id % 97 = 0` — in production it is a
    * broadcast tombstone artifact and nothing else changes. Scale shape:
    * each table contributes ONE filtered aggregation (tombstones
    * broadcast as a semi-join predicate); the cascade joins lineitem
    * against only the ERASED customers' orders (delta-sized, broadcast),
    * never orders×lineitem at large; the result is 4 rows. */
  private[operators] def x119(spark: SparkSession, dir: String): DataFrame = {
    def plan(df: DataFrame, tbl: String, id: String, cascade: Boolean): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
        countDistinct(col(id)).as("n_subjects"))
        .select(lit(tbl).as("tbl"), col("n_rows"), col("n_subjects"),
          lit(cascade).as("cascade"))
    val cust = Tables.customer(spark, dir).filter(col("c_custkey") % 97 === 0)
    val ords = Tables.orders(spark, dir).filter(col("o_custkey") % 97 === 0)
    val evts = Tables.events(spark, dir).filter(col("user_id") % 97 === 0)
    // the erased-subject order set is residue-class here (request-scale in
    // production, but nothing guarantees a bounded request) — SIZE-GATED
    val casc = Tables.lineitem(spark, dir)
      .join(gatedBroadcast(spark,
        ords.select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
        "spark.graft.erasure.broadcastSubjectCap"), "l_orderkey")
    plan(cust, "customer", "c_custkey", cascade = false)
      .unionByName(plan(ords, "orders", "o_custkey", cascade = false))
      .unionByName(plan(evts, "events", "user_id", cascade = false))
      .unionByName(plan(casc, "lineitem", "o_custkey", cascade = true))
  }

  private[operators] lazy val x119Sql =
    """SELECT 'customer' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_subjects, FALSE AS cascade
      |FROM customer WHERE c_custkey % 97 = 0
      |UNION ALL
      |SELECT 'orders', CAST(count(*) AS BIGINT),
      |  CAST(count(DISTINCT o_custkey) AS BIGINT), FALSE
      |FROM orders WHERE o_custkey % 97 = 0
      |UNION ALL
      |SELECT 'events', CAST(count(*) AS BIGINT),
      |  CAST(count(DISTINCT user_id) AS BIGINT), FALSE
      |FROM events WHERE user_id % 97 = 0
      |UNION ALL
      |SELECT 'lineitem', CAST(count(*) AS BIGINT),
      |  CAST(count(DISTINCT o_custkey) AS BIGINT), TRUE
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_custkey % 97 = 0""".stripMargin

  private[operators] lazy val x118Sql =
    """WITH c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS true_count
      |  FROM events GROUP BY 1),
      |u AS (SELECT *,
      |    (('0x' || substr(md5(event_type || ':release1'), 1, 12))::BIGINT + 0.5)
      |      / 281474976710656.0 AS u
      |  FROM c)
      |SELECT event_type, true_count,
      |  CAST(round((CASE WHEN u >= 0.5 THEN -1.0 ELSE 1.0 END)
      |    * ln(1.0 - 2.0 * abs(u - 0.5)) * 1000000.0, 0) AS BIGINT) AS noise_micros,
      |  true_count * 1000000 +
      |    CAST(round((CASE WHEN u >= 0.5 THEN -1.0 ELSE 1.0 END)
      |      * ln(1.0 - 2.0 * abs(u - 0.5)) * 1000000.0, 0) AS BIGINT)
      |    AS noisy_count_micros,
      |  CAST(1000000 AS BIGINT) AS epsilon_micros
      |FROM u""".stripMargin

  // ---------------------------------------------------------------- X144
  /** RANK-SUM QUALITY-DRIFT TEST — the NONPARAMETRIC complement to
    * x117's Welch t (quality scores are bounded ratios, not Gaussians;
    * the rank test needs no distributional assumption): per source, a
    * tie-corrected Mann–Whitney U of its integer quality scores (qs27's
    * exact-ppm x8 composite) against the rest of the corpus, with the
    * 5%-two-sided significance decided by a FULLY INTEGER comparison —
    * z₀ = 1.96 is exactly 49/25, so z² ≥ z₀² becomes
    * 625·(2U−n_s·n_r)²·3·N(N−1) ≥ 2401·n_s·n_r·K with
    * K = (N+1)N(N−1) − Σ(t³−t): ZERO transcendentals, zero
    * RoundBoundarySpec surface — the entire test, midranks included, is
    * integer arithmetic (midranks carried doubled: mid2 = 2·cum+t+1).
    * Scale shape: the qs27 insight again — scores live on the fixed ppm
    * grid, so ranks come from a COUNT HISTOGRAM (one corpus scan →
    * (source, score) counts; cumulative counts over the ≤10⁶-cell
    * pooled grid, never a corpus sort); per-source rank sums are a
    * broadcast join of the counts frame onto the pooled midranks, and
    * the output is |sources| rows. Value ranges: exact through
    * N ~ 10⁹ docs in DECIMAL(38,0)/HUGEINT (the z² numerator grows as
    * N·(n_s·n_r)² ~ N⁵ — an eval slice, not the raw corpus, is the
    * documented input past that). Degenerate guard: all-scores-tied
    * makes K = 0 (Var = 0) → z² = 0, not significant. */
  private[operators] def x144(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .withColumn("tk", toks(col("text")))
      .select(col("source"),
        size(col("tk")).cast(LongType).as("n"),
        size(array_distinct(col("tk"))).cast(LongType).as("u"),
        expr(s"graft_count_in(tk, ${TextConstants.stopwordsArrayExpr})")
          .cast(LongType).as("st"))
      .select(col("source"),
        expr("((u + n - st) * 2000000 + 2 * n) div (4 * n)").as("score"))
      .groupBy(col("source"), col("score"))
      .agg(count(lit(1)).as("c"))
    // finisher + oracle live in RankSum — ONE implementation shared
    // with the streaming twin qs28 (drain == batch by construction)
    RankSum.audit(counts)
  }

  private[operators] lazy val x144Sql = RankSum.oracleSql
}
