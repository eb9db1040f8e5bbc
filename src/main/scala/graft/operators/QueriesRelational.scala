package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Relational/warehouse queries (SURVEY §2.3 Q-series): scans, joins,
  * aggregations, windows, set ops, reshaping, merge/CDC, funnels.
  *
  * Split out of the monolithic Queries.scala in r7 (registry unchanged —
  * every member mixes back into [[Queries]], whose self-type these traits
  * require). Members are `private[operators]`; SQL oracles are lazy so
  * cross-trait references are initialization-order-safe.
  */
private[operators] trait QueriesRelational { this: Queries.type =>

  // ---------------------------------------------------------------- Q1
  /** TPC-H Q1-style pricing summary: scan → filter → hash agg → sort.
    * (ref: docs/examples/spend/demo.py:35-39 is the reference's only agg;
    * this is the batteries-included generalization, SURVEY §2.3 Q1.) */
  private[operators] def q1(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= tsNtz("2000-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        // exact decimal sums internally; final output is ONE cast to double
        // + round at the decimal's own scale (nothing to round → both
        // engines emit the identical nearest-double). DECIMAL-typed output
        // columns are avoided: the driver's canonicalization of decimals
        // differs across widths, while 6dp-rounded doubles are stable.
        round(sum(dec(col("l_quantity"))).cast(DoubleType), 2).as("sum_qty"),
        round(sum(dec(col("l_extendedprice"))).cast(DoubleType), 2).as("sum_base_price"),
        // decimal arithmetic over per-column casts: casting a *computed*
        // double hits midpoint rounding (HALF_UP vs half-even) differently
        // across engines; raw 2-decimal columns never sit on a midpoint.
        // SUM columns round at 2dp: their magnitude grows with SF, and a
        // finer rounding scale eventually sits below the double's ULP
        // (at sf0.1 sum_charge ≈ 4.35e9, ULP ≈ 4.8e-7 — a 6dp round there
        // is engine-dependent by one ulp). The 6dp rounds stay on the
        // small-magnitude avg columns only.
        round(sum(col("l_extendedprice").cast(DecimalType(12, 2)) *
          (lit(1).cast(DecimalType(4, 2)) - col("l_discount").cast(DecimalType(4, 2)))).cast(DoubleType), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice").cast(DecimalType(12, 2)) *
          (lit(1).cast(DecimalType(4, 2)) - col("l_discount").cast(DecimalType(4, 2))) *
          (lit(1).cast(DecimalType(4, 2)) + col("l_tax").cast(DecimalType(4, 2)))).cast(DoubleType), 2).as("sum_charge"),
        round(sum(dec(col("l_quantity"))).cast(DoubleType) / count(lit(1)), 6).as("avg_qty"),
        round(sum(dec(col("l_extendedprice"))).cast(DoubleType) / count(lit(1)), 6).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private[operators] lazy val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 2) AS sum_disc_price,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE), 2) AS sum_charge,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- Q2
  /** Equi inner join + projection; filters/columns push to the parquet scan. */
  private[operators] def q2(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 150000.0)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
        col("c_name"), col("c_mktsegment"), col("c_acctbal"))

  private[operators] lazy val q2Sql =
    """SELECT o_orderkey, o_orderdate, o_totalprice, c_name, c_mktsegment, c_acctbal
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE o_totalprice > 150000.0""".stripMargin

  // ---------------------------------------------------------------- Q3
  /** Star-schema multi-join with broadcast dims, grouped revenue. */
  private[operators] def q3(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).cast(IntegerType).as("order_year"))
      .agg(
        round(sum(dec(col("o_totalprice"))).cast(DoubleType), 2).as("revenue"),
        count(lit(1)).as("n_orders"),
        countDistinct(col("c_custkey")).as("n_customers"))
      .orderBy(col("r_name"), col("order_year"))

  private[operators] lazy val q3Sql =
    """SELECT r_name, CAST(year(o_orderdate) AS INT) AS order_year,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue,
      |  count(*) AS n_orders,
      |  count(DISTINCT c_custkey) AS n_customers
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, CAST(year(o_orderdate) AS INT)
      |ORDER BY r_name, order_year""".stripMargin

  // ---------------------------------------------------------------- Q4
  /** Left-semi + left-anti joins (EXISTS / NOT EXISTS). */
  private[operators] def q4(spark: SparkSession, dir: String): DataFrame = {
    val sup  = Tables.supplier(spark, dir)
    val bulk = Tables.lineitem(spark, dir).filter(col("l_quantity") >= 48.0)
    val semi = sup.join(bulk, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name")).withColumn("status", lit("has_bulk"))
    val anti = sup.join(bulk, col("s_suppkey") === col("l_suppkey"), "left_anti")
      .select(col("s_suppkey"), col("s_name")).withColumn("status", lit("no_bulk"))
    semi.unionAll(anti)
  }

  private[operators] lazy val q4Sql =
    """SELECT s_suppkey, s_name, 'has_bulk' AS status FROM supplier
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity >= 48.0)
      |UNION ALL
      |SELECT s_suppkey, s_name, 'no_bulk' AS status FROM supplier
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity >= 48.0)""".stripMargin

  // ---------------------------------------------------------------- Q5
  /** Pure non-equi (theta) join → BroadcastNestedLoopJoin, kept ONLY as the
    * documented exactness cross-check for the linear rewrite (q5 proper,
    * below): both sides are pre-aggregated so the quadratic comparison runs
    * on |part_subset| × |distinct partkeys|, but it is still O(n·m) work
    * and the broadcast side grows with data — NOT the shape to run at
    * 100 TB. The default q5_theta_margin uses the bucketed rewrite; this
    * registers as q5b. */
  private[operators] def q5Bnlj(spark: SparkSession, dir: String): DataFrame = {
    val pmax = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey")).agg(max(col("l_extendedprice")).as("max_price"))
    // repartition: the filtered part scan is 1 file partition, which would
    // serialize the nested-loop comparison on a single core; width follows
    // the session's shuffle parallelism, never a literal
    val p = Tables.part(spark, dir).filter(col("p_size") >= 46)
      .repartition(spark.sessionState.conf.numShufflePartitions)
    // per-part partial agg first: the join output is ~|p|x|pmax| rows, and
    // map-side reduction to one row per part is what keeps the final
    // exchange tiny at any scale
    p.join(pmax, col("max_price") > col("p_retailprice") * 1.5)
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(count(lit(1)).as("n_matches"))
      .groupBy(col("p_brand"))
      .agg(sum(col("n_matches")).as("n_pairs"), count(lit(1)).as("n_parts"))
      .orderBy(col("p_brand"))
  }

  private[operators] lazy val q5Sql =
    """WITH pmax AS (SELECT l_partkey, max(l_extendedprice) AS max_price FROM lineitem GROUP BY l_partkey)
      |SELECT p_brand, CAST(sum(n_matches) AS BIGINT) AS n_pairs, count(*) AS n_parts FROM (
      |  SELECT p_brand, p_partkey, count(*) AS n_matches
      |  FROM part, pmax
      |  WHERE p_size >= 46 AND max_price > p_retailprice * 1.5
      |  GROUP BY p_brand, p_partkey) t
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- Q5 (default)
  /** The theta-join semantics WITHOUT the nested loop — the default and the
    * 100 TB path: a bucketed order-statistics rewrite. matches(t) =
    * |{max_price > t}| = N - |{max_price <= t}|, where the <=-count splits
    * into "full buckets strictly below t's bucket" (a metadata-scale prefix
    * table, ~100 rows) plus an equi-join count within t's own bucket. Every
    * stage is an equi-join or a bounded aggregation — linear shuffles,
    * fully parallel, no O(|part|x|pmax|) comparison anywhere. Same oracle
    * as the BNLJ cross-check: the two physical strategies must agree
    * bit-for-bit. */
  private[operators] def q5Linear(spark: SparkSession, dir: String): DataFrame = {
    val bucketW = 1000.0
    val pmax = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey")).agg(max(col("l_extendedprice")).as("v"))
      .withColumn("b", floor(col("v") / bucketW).cast(LongType))
    val thr = Tables.part(spark, dir).filter(col("p_size") >= 46)
      .select(col("p_brand"), col("p_partkey"), (col("p_retailprice") * 1.5).as("t"))
      .withColumn("b", floor(col("t") / bucketW).cast(LongType))

    // bucket histogram → prefix counts, built as DataFrames end-to-end (no
    // driver collect — the old version materialized the histogram on the
    // driver, whose size is price_range/W: data-dependent and unbounded).
    // Every frame here is METADATA-scale (one row per occupied bucket), so
    // the single-partition running-sum window and the broadcasts below are
    // bounded by the bucket count, never by the data.
    val histB = pmax.groupBy(col("b")).agg(count(lit(1)).as("c"))
    val thrB = thr.select(col("b")).distinct().withColumn("c", lit(0L))
    val allB = histB.unionByName(thrB).groupBy(col("b")).agg(sum(col("c")).as("c"))
    val wb = Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // n_total rides the same single-partition window sort (sum of ALL bucket
    // counts = |pmax|), so no 1-row cross join is needed downstream
    val prefix = allB
      .withColumn("below", coalesce(sum(col("c")).over(wb), lit(0L)))
      .withColumn("n_total", sum(col("c")).over(wAll))
      .select(col("b"), col("below"), col("n_total"))

    // within-bucket residual: equi-join on bucket, count vals with v <= t
    val sameBucket = thr.join(pmax.select(col("b"), col("v")), Seq("b"), "left")
      .groupBy(col("p_brand"), col("p_partkey"), col("t"), col("b"))
      .agg(sum(when(col("v") <= col("t"), 1L).otherwise(0L)).as("le_in_bucket"))

    sameBucket.join(broadcast(prefix), Seq("b"))
      .withColumn("n_matches", col("n_total") - (col("below") + col("le_in_bucket")))
      .filter(col("n_matches") > 0)
      .groupBy(col("p_brand"))
      .agg(sum(col("n_matches")).as("n_pairs"), count(lit(1)).as("n_parts"))
      .orderBy(col("p_brand"))
  }

  // ---------------------------------------------------------------- Q6
  /** As-of join: for each purchase event, the latest click of the same user
    * at-or-before its timestamp. Implemented shuffle-once with a RANGE window
    * over the unioned stream (no join at all — the scalable as-of shape);
    * the oracle uses DuckDB's native ASOF LEFT JOIN. RANGE … CURRENT ROW
    * includes ts-peers, exactly matching ASOF's `c.ts <= p.ts`. */
  private[operators] def q6(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("last_click_ts", max(when(col("event_type") === "click", col("ts"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("last_click_ts"))
  }

  private[operators] lazy val q6Sql =
    """SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts, CAST(c.ts AS TIMESTAMP) AS last_click_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND c.ts <= p.ts""".stripMargin

  // --------------------------------------------------------------- Q6B
  /** q6's as-of semantics through the CUSTOM PHYSICAL OPERATOR
    * ([[graft.plans.AsofJoinExec]] via the injected planner strategy) —
    * the q5/q5b pattern: same answer, second physical path, each
    * cross-checking the other against the same DuckDB ASOF oracle. The
    * custom exec pays the identical exchange (hash on user, sort by
    * (user, ts)) but replaces the union+range-window machinery with one
    * streaming merge holding a single buffered right row. Ties in click
    * ts are emission-safe: only the ts value is emitted (see the
    * operator's determinism contract). */
  private[operators] def q6b(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    graft.plans.AsofJoin.asof(purchases, clicks, "user_id", "c_user", "ts", "c_ts")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("c_ts").as("last_click_ts"))
  }

  // ---------------------------------------------------------------- Q7
  /** Per-group top-k via ranking window with unique tiebreaker. */
  private[operators] def q7(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
  }

  private[operators] lazy val q7Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      |  FROM orders) t
      |WHERE rn <= 3""".stripMargin

  // ---------------------------------------------------------------- Q8
  /** Window-function suite: rank/dense_rank, lag/lead, sliding-frame moving
    * average, exact running total (decimal). */
  private[operators] def q8(spark: SparkSession, dir: String): DataFrame = {
    val byDate  = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val byPrice = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc)
    Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderkey"),
      rank().over(byPrice).as("price_rank"),
      dense_rank().over(byPrice).as("price_dense_rank"),
      lag(col("o_totalprice"), 1).over(byDate).as("prev_price"),
      lead(col("o_totalprice"), 1).over(byDate).as("next_price"),
      round(avg(col("o_totalprice")).over(byDate.rowsBetween(-2, 0)), 6).as("mov_avg3"),
      round(sum(dec(col("o_totalprice"))).over(byDate.rowsBetween(Window.unboundedPreceding, 0)).cast(DoubleType), 2).as("run_total"))
  }

  private[operators] lazy val q8Sql =
    """SELECT o_custkey, o_orderkey,
      |  CAST(rank() OVER wp AS INT) AS price_rank,
      |  CAST(dense_rank() OVER wp AS INT) AS price_dense_rank,
      |  lag(o_totalprice, 1) OVER wd AS prev_price,
      |  lead(o_totalprice, 1) OVER wd AS next_price,
      |  round(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov_avg3,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS run_total
      |FROM orders
      |WINDOW wp AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC),
      |       wd AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin

  // ---------------------------------------------------------------- Q9
  /** CUBE grouping sets with grouping() bitmask. */
  private[operators] def q9(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(dec(col("o_totalprice"))).cast(DoubleType), 2).as("total"),
        (grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority"))).cast(IntegerType).as("gid"))

  private[operators] lazy val q9Sql =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total,
      |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS INT) AS gid
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  // ---------------------------------------------------------------- Q10
  /** Exact distinct counts (the approximate HLL variant is q10b, engine-
    * specific so rows-only checked). */
  private[operators] def q10(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"),
      countDistinct(col("l_orderkey")).as("n_orders"),
      countDistinct(col("l_returnflag"), col("l_linestatus")).as("n_flag_status"))

  private[operators] lazy val q10Sql =
    """SELECT count(*) AS n_rows,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps,
      |  count(DISTINCT l_orderkey) AS n_orders,
      |  count(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status
      |FROM lineitem""".stripMargin

  /** HLL approximate distinct, HASH-GATED (r7): the raw estimate is
    * engine-specific (Spark's HLL++ vs anything else), so what the oracle
    * pins is the ACCURACY CONTRACT — the exact distinct counts plus an
    * integer flag that the engine's estimate sits within 3 relative
    * standard deviations (rsd = 0.05) of exact. The oracle emits the
    * contract (flag = 1); if the estimator ever degrades past 3·rsd the
    * engine emits 0 and the row goes red — the gate now checks the sketch
    * instead of skipping it. Raw estimate values stay spec-checked in
    * TrainingOpsSpec, not hash-compared. */
  private[operators] def q10b(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).agg(
      countDistinct(col("l_partkey")).as("exact_parts"),
      approx_count_distinct(col("l_partkey"), 0.05).as("approx_parts"),
      countDistinct(col("l_orderkey")).as("exact_orders"),
      approx_count_distinct(col("l_orderkey"), 0.05).as("approx_orders"))
      .select(
        col("exact_parts"), col("exact_orders"),
        (abs(col("approx_parts") - col("exact_parts")).cast(DoubleType) <=
          col("exact_parts") * lit(0.15)).cast(IntegerType).as("parts_within_3rsd"),
        (abs(col("approx_orders") - col("exact_orders")).cast(DoubleType) <=
          col("exact_orders") * lit(0.15)).cast(IntegerType).as("orders_within_3rsd"))

  private[operators] lazy val q10bSql =
    """SELECT count(DISTINCT l_partkey) AS exact_parts,
      |  count(DISTINCT l_orderkey) AS exact_orders,
      |  CAST(1 AS INT) AS parts_within_3rsd,
      |  CAST(1 AS INT) AS orders_within_3rsd
      |FROM lineitem""".stripMargin

  // ---------------------------------------------------------------- Q11
  /** Set operators: INTERSECT / EXCEPT / UNION (distinct semantics). */
  private[operators] def q11(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val a = cust.join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey").as("k"))
    val b = cust.filter(col("c_acctbal") > 5000.0).select(col("c_custkey").as("k"))
    a.intersect(b).withColumn("op", lit("intersect"))
      .unionAll(a.except(b).withColumn("op", lit("except")))
      .unionAll(a.unionAll(b).distinct().withColumn("op", lit("union")))
      .select(col("op"), col("k"))
  }

  private[operators] lazy val q11Sql =
    """WITH a AS (SELECT c_custkey AS k FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)),
      |     b AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000.0)
      |SELECT 'intersect' AS op, k FROM (SELECT k FROM a INTERSECT SELECT k FROM b) t
      |UNION ALL SELECT 'except' AS op, k FROM (SELECT k FROM a EXCEPT SELECT k FROM b) t
      |UNION ALL SELECT 'union' AS op, k FROM (SELECT k FROM a UNION SELECT k FROM b) t""".stripMargin

  // ---------------------------------------------------------------- Q12
  /** Scalar-function suite: string / date / math / JSON extraction. All math
    * is exact over doubles (multiplication by 4 is a power of two; v*v is a
    * single IEEE product) so values are bit-identical across engines. */
  private[operators] def q12(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"),
      upper(col("event_type")).as("etype_u"),
      substring(col("event_type"), 1, 3).as("etype3"),
      concat(col("event_type"), lit("_"), col("user_id").cast(StringType)).as("tag"),
      length(col("props")).as("props_len").cast(IntegerType).as("props_len"),
      year(col("ts")).cast(IntegerType).as("y"),
      month(col("ts")).cast(IntegerType).as("m"),
      dayofmonth(col("ts")).cast(IntegerType).as("d"),
      hour(col("ts")).cast(IntegerType).as("h"),
      date_trunc("day", col("ts")).cast(TimestampNTZType).as("ts_day"),
      col("ts").cast(DateType).as("ts_date"),
      abs(col("value") - 50.0).as("v_abs"),
      floor(col("value")).cast(LongType).as("v_floor"),
      ceil(col("value")).cast(LongType).as("v_ceil"),
      (col("value") * 4).as("v4"),
      (col("value") * col("value")).as("v_sq"),
      (col("user_id") % 7).as("u_mod"),
      get_json_object(col("props"), "$.k").cast(LongType).as("k_val"),
      from_json(col("props"), StructType(Seq(StructField("k", LongType))))
        .getField("k").as("k_val2"),
      when(col("value") > 100.0, "high").otherwise("low").as("v_band"))

  private[operators] lazy val q12Sql =
    """SELECT event_id,
      |  upper(event_type) AS etype_u,
      |  substring(event_type, 1, 3) AS etype3,
      |  event_type || '_' || CAST(user_id AS VARCHAR) AS tag,
      |  CAST(length(props) AS INT) AS props_len,
      |  CAST(year(ts) AS INT) AS y,
      |  CAST(month(ts) AS INT) AS m,
      |  CAST(day(ts) AS INT) AS d,
      |  CAST(hour(ts) AS INT) AS h,
      |  CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts_day,
      |  CAST(ts AS DATE) AS ts_date,
      |  abs(value - 50.0) AS v_abs,
      |  CAST(floor(value) AS BIGINT) AS v_floor,
      |  CAST(ceil(value) AS BIGINT) AS v_ceil,
      |  value * 4 AS v4,
      |  value * value AS v_sq,
      |  user_id % 7 AS u_mod,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val2,
      |  CASE WHEN value > 100.0 THEN 'high' ELSE 'low' END AS v_band
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- Q17
  /** Artifact statistics (SURVEY F38 realized): one-pass per-column profile. */
  private[operators] def q17(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).agg(
      count(lit(1)).as("n_rows"),
      min(col("l_shipdate")).as("min_shipdate"),
      max(col("l_shipdate")).as("max_shipdate"),
      min(col("l_quantity")).as("min_qty"),
      max(col("l_quantity")).as("max_qty"),
      round(sum(dec(col("l_quantity"))).cast(DoubleType), 2).as("sum_qty"),
      round(sum(dec(col("l_extendedprice"))).cast(DoubleType), 2).as("sum_price"),
      countDistinct(col("l_orderkey")).as("n_orders"),
      countDistinct(col("l_partkey")).as("n_parts"),
      min(col("l_extendedprice")).as("min_price"),
      max(col("l_extendedprice")).as("max_price"))

  private[operators] lazy val q17Sql =
    """SELECT count(*) AS n_rows,
      |  CAST(min(l_shipdate) AS TIMESTAMP) AS min_shipdate,
      |  CAST(max(l_shipdate) AS TIMESTAMP) AS max_shipdate,
      |  min(l_quantity) AS min_qty,
      |  max(l_quantity) AS max_qty,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price,
      |  count(DISTINCT l_orderkey) AS n_orders,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  min(l_extendedprice) AS min_price,
      |  max(l_extendedprice) AS max_price
      |FROM lineitem""".stripMargin

  // ---------------------------------------------------------------- Q18
  /** Statistical moments with determinism-by-construction: mean, sample
    * variance/stddev, and Pearson correlation are all derived from EXACT
    * decimal moment sums (x, x², y, y², x·y of 2-decimal columns are exact
    * in scale-4 decimals), cast to double once, then combined with the same
    * IEEE expression shape as the oracle — so the doubles are bit-identical
    * across engines, unlike native stddev/corr whose partial-aggregation
    * order differs. */
  private[operators] def q18(spark: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity").cast(DecimalType(12, 2))
    val y = col("l_extendedprice").cast(DecimalType(12, 2))
    val agged = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"), sum(x * x).as("sxx"),
        sum(y).as("sy"), sum(y * y).as("syy"),
        sum(x * y).as("sxy"))
    val n = col("n").cast(DoubleType)
    val (sx, sxx, sy, syy, sxy) =
      (col("sx").cast(DoubleType), col("sxx").cast(DoubleType),
        col("sy").cast(DoubleType), col("syy").cast(DoubleType), col("sxy").cast(DoubleType))
    agged.select(
      col("l_returnflag"), col("n"),
      round(sx / n, 6).as("mean_qty"),
      round((sxx - sx * sx / n) / (n - 1), 6).as("var_qty"),
      round(sqrt((sxx - sx * sx / n) / (n - 1)), 6).as("std_qty"),
      round((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6).as("corr_qty_price"))
  }

  private[operators] lazy val q18Sql =
    """WITH m AS (
      |  SELECT l_returnflag, count(*) AS n,
      |    sum(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
      |    sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS sxx,
      |    sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS sy,
      |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS syy,
      |    sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS sxy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_qty,
      |  round((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1), 6) AS var_qty,
      |  round(sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)), 6) AS std_qty,
      |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |        / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |           * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr_qty_price
      |FROM m""".stripMargin

  // ---------------------------------------------------------------- Q19
  /** Exact interpolated percentiles — the DISTRIBUTED order-statistic plan
    * (r10, replacing the value-buffering `percentile` aggregate, which
    * materializes every raw value of a group inside ONE task's aggregation
    * buffer: fine at 60 k rows, a single-task OOM at any real scale — the
    * registry's last such plan; x50's percentile_disc cut the same pattern
    * 11.4 s → 1.4 s).
    *
    * Recipe = x50's DISTINCT-VALUE HISTOGRAM generalized to *interpolated*
    * (quantile_cont) semantics: one map-side-combined groupBy collapses the
    * corpus to (flag, column, value, count); a cumulative-count window runs
    * over DISTINCT values only — its partitions are bounded by the VALUE
    * DOMAIN (qty: 50 integers; price: the DECIMAL(8,2)-shaped grid, ≤ ~10 M
    * narrow rows at ANY table size — domain-bounded, not data-bounded, the
    * x50 argument); value-at-rank-k = min value whose cumulative count
    * reaches k, an exact rank selection with no bucket-boundary routing.
    * Interpolation replicates Spark's `Percentile` evaluator BIT-FOR-BIT:
    * position = (n−1)·p in doubles, lower/higher = floor/ceil, result =
    * (higher−pos)·v_lo + (pos−lower)·v_hi (v_lo when they coincide) — the
    * same arithmetic DuckDB's quantile_cont agrees with under round(6),
    * proven by this query's own 9-round oracle history on the buffered
    * plan. Whole plan: ONE corpus shuffle (the distinct-value histogram),
    * domain-bounded windows, a 3-row final aggregate — no driver finisher.
    *
    * `spark.graft.percentile.bufferCap` (default 0) re-admits the buffered
    * aggregate for corpora at or below the cap — 0 means the gate count is
    * never even run (no construction-time action; the count itself is
    * parquet-metadata-scale when enabled). Threshold-MAX identity spec in
    * PlansSpec proves the two paths emit identical rows; the PlansSpec
    * plan gate asserts no Percentile aggregate under the default conf. */
  private[operators] def q19(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val cap = spark.conf.getOption("spark.graft.percentile.bufferCap")
      .map(_.toLong).getOrElse(0L)
    if (cap > 0 && li.count() <= cap) q19Buffered(li) else q19Selected(li)
  }

  /** The pre-r10 value-buffering plan, kept as the small-corpus fast path
    * behind the bufferCap gate (single aggregation, no window machinery —
    * cheaper below ~10⁴ rows, lethal above). */
  private def q19Buffered(li: DataFrame): DataFrame =
    li.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(expr("percentile(l_quantity, 0.5)"), 6).as("p50_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"),
        round(expr("percentile(l_extendedprice, 0.25)"), 6).as("p25_price"),
        round(expr("percentile(l_extendedprice, 0.99)"), 6).as("p99_price"))
      .orderBy(col("l_returnflag"))

  private def q19Selected(li: DataFrame): DataFrame = {
    val specs = Seq(("q", 0.5, "p50_qty"), ("q", 0.9, "p90_qty"),
      ("p", 0.25, "p25_price"), ("p", 0.99, "p99_price"))
    // both columns' histograms ride ONE shuffle via a zero-cost union of
    // two column-pruned scans (plain whole-stage codegen end-to-end — no
    // generator node; each leg's parquet scan reads flag + one value
    // column). Null values ride along: excluded from ranks, counted in
    // n_tot so n = count(*) stays exact with no second corpus pass.
    val pairs = li.select(col("l_returnflag"), lit("q").as("cid"), col("l_quantity").as("v"))
      .unionAll(li.select(col("l_returnflag"), lit("p").as("cid"), col("l_extendedprice").as("v")))
    val counts = pairs.groupBy(col("l_returnflag"), col("cid"), col("v"))
      .agg(count(lit(1)).as("c"))
    val wOrd = Window.partitionBy(col("l_returnflag"), col("cid"))
      .orderBy(col("v").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("l_returnflag"), col("cid"))
      .orderBy(col("v").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val nnC = when(col("v").isNotNull, col("c"))
    val cum = counts
      .withColumn("cum", sum(nnC).over(wOrd))
      .withColumn("n_nn", sum(nnC).over(wAll))
      .withColumn("n_tot", sum(col("c")).over(wAll))
    val aggs = specs.flatMap { case (cid, p, name) =>
      // position/ranks are constant within a (flag, cid) partition; min()
      // just lifts them through the group-by (Spark's evaluator computes
      // position = (count−1)·percentage in exactly these double ops)
      val posc = (col("n_nn") - lit(1L)).cast(DoubleType) * lit(p)
      val isCid = col("cid") === cid && col("v").isNotNull
      Seq(
        min(when(isCid && col("cum") >= floor(posc) + lit(1L), col("v"))).as(s"${name}_lo"),
        min(when(isCid && col("cum") >= ceil(posc) + lit(1L), col("v"))).as(s"${name}_hi"),
        min(when(isCid, posc)).as(s"${name}_pos"))
    } :+ min(when(col("cid") === "q", col("n_tot"))).as("n_rows")
    val sel = cum.groupBy(col("l_returnflag")).agg(aggs.head, aggs.tail: _*)
    def interp(name: String): Column = {
      val posc = col(s"${name}_pos")
      val (lo, hi) = (col(s"${name}_lo"), col(s"${name}_hi"))
      round(when(floor(posc) === ceil(posc), lo)
        .otherwise((ceil(posc) - posc) * lo + (posc - floor(posc)) * hi), 6).as(name)
    }
    sel.select(col("l_returnflag"), col("n_rows").as("n"),
        interp("p50_qty"), interp("p90_qty"), interp("p25_price"), interp("p99_price"))
      .orderBy(col("l_returnflag"))
  }

  private[operators] lazy val q19Sql =
    """SELECT l_returnflag, count(*) AS n,
      |  round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
      |  round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
      |  round(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price,
      |  round(quantile_cont(l_extendedprice, 0.99), 6) AS p99_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- Q20
  /** Content-addressing fingerprint column (SURVEY F34 as a data op):
    * xxhash64 over the row STRUCT (typed, null-discriminating — unlike a
    * string concat, NULL and '' hash differently), XOR-combined per group:
    * order-independent, the distributed analog of the reference's
    * Fingerprint.combine (reference: src/arti/fingerprints/__init__.py:18-66).
    * Serialization is a deliberate canonical form — ints/strings verbatim,
    * money as DECIMAL(18,2) strings, dates as ISO — so BOTH engines
    * produce identical bytes, and the sha256-based 64-bit fingerprint
    * (graft_sha64) is replicable in DuckDB: a FULL-ALGORITHM oracle for
    * content addressing, not a rows-only check. XOR makes the combine
    * order-independent (partition-parallel safe). */
  private[operators] def q20(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.withColumn("ser", concat_ws("|",
        col("l_orderkey").cast(StringType), col("l_linenumber").cast(StringType),
        col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast(DecimalType(18, 2)).cast(StringType),
        col("l_extendedprice").cast(DecimalType(18, 2)).cast(StringType),
        col("l_shipdate").cast(DateType).cast(StringType)))
      .withColumn("fp", element_at(expr("graft_sha64(array(ser))"), 1))
      .groupBy(col("l_returnflag"))
      .agg(expr("bit_xor(fp)").as("xor_fp"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** sha64 in DuckDB: first 16 hex chars of sha256 → exact unsigned value
    * via 4×16-bit integer chunks (no floating point), then two's-complement
    * to the signed 64-bit space graft_sha64 emits. */
  private[operators] lazy val q20Sql =
    """WITH r AS (SELECT l_returnflag,
      |  concat_ws('|', l_orderkey::VARCHAR, l_linenumber::VARCHAR, l_returnflag, l_linestatus,
      |    (l_quantity::DECIMAL(18,2))::VARCHAR, (l_extendedprice::DECIMAL(18,2))::VARCHAR,
      |    (l_shipdate::DATE)::VARCHAR) AS s
      |  FROM lineitem),
      |hx AS (SELECT l_returnflag, substr(sha256(s), 1, 16) AS h FROM r),
      |ch AS (SELECT l_returnflag,
      |  list_transform(range(4), c -> CAST(
      |    (strpos('0123456789abcdef', substr(h, CAST(c*4 AS INT) + 1, 1)) - 1) * 4096
      |    + (strpos('0123456789abcdef', substr(h, CAST(c*4 AS INT) + 2, 1)) - 1) * 256
      |    + (strpos('0123456789abcdef', substr(h, CAST(c*4 AS INT) + 3, 1)) - 1) * 16
      |    + (strpos('0123456789abcdef', substr(h, CAST(c*4 AS INT) + 4, 1)) - 1) AS HUGEINT)) AS cs
      |  FROM hx),
      |fp AS (SELECT l_returnflag, CAST(
      |    ((cs[1] * 65536 + cs[2]) * 65536 + cs[3]) * 65536 + cs[4]
      |    - CASE WHEN cs[1] >= 32768 THEN 18446744073709551616 ELSE 0 END AS BIGINT) AS fp
      |  FROM ch)
      |SELECT l_returnflag, bit_xor(fp) AS xor_fp, count(*) AS n
      |FROM fp GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- Q22
  /** Pivot (wide aggregation): order counts and exact decimal totals per
    * status × priority, with an explicit pivot-value list so the output
    * schema is static (the scalable form — pivoting on discovered values
    * needs a driver-side distinct first). Oracle via conditional
    * aggregation, which is what Catalyst lowers pivot to. */
  private[operators] lazy val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  private[operators] def q22(spark: SparkSession, dir: String): DataFrame = {
    val renamed = priorities.zipWithIndex.flatMap { case (p, i) =>
      // counts: pivot leaves absent combinations null, SQL's count FILTER
      // yields 0 — coalesce so the two agree; totals leave the exact
      // decimal sum as a single cast to double + round (null stays null)
      Seq(coalesce(col("`" + p + "_n`"), lit(0L)).as(s"p${i + 1}_n"),
        round(col("`" + p + "_total`").cast(DoubleType), 2).as(s"p${i + 1}_total"))
    }
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", priorities)
      .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).as("total"))
      .select(col("o_orderstatus") +: renamed: _*)
      .orderBy(col("o_orderstatus"))
  }

  private[operators] lazy val q22Sql = {
    val cols = priorities.zipWithIndex.map { case (p, i) =>
      s"  count(*) FILTER (o_orderpriority = '$p') AS p${i + 1}_n," +
        s" round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderpriority = '$p') AS DOUBLE), 2) AS p${i + 1}_total"
    }.mkString(",\n")
    s"SELECT o_orderstatus,\n$cols\nFROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"
  }

  // ---------------------------------------------------------------- Q24
  /** Outer-join family: per-nation customer/supplier aggregates FULL OUTER
    * joined on the nation key — either side can be absent, so both null
    * directions and the key coalesce are exercised. */
  private[operators] def q24(spark: SparkSession, dir: String): DataFrame = {
    val custN = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("cust_n"))
    val suppN = Tables.supplier(spark, dir)
      .groupBy(col("s_nationkey").as("nk2")).agg(count(lit(1)).as("supp_n"))
    custN.join(suppN, col("nk") === col("nk2"), "full_outer")
      .select(
        coalesce(col("nk"), col("nk2")).as("nationkey"),
        col("cust_n"), col("supp_n"))
      .orderBy(col("nationkey"))
  }

  private[operators] lazy val q24Sql =
    """WITH c AS (SELECT c_nationkey AS nk, count(*) AS cust_n FROM customer GROUP BY 1),
      |     s AS (SELECT s_nationkey AS nk, count(*) AS supp_n FROM supplier GROUP BY 1)
      |SELECT coalesce(c.nk, s.nk) AS nationkey, cust_n, supp_n
      |FROM c FULL OUTER JOIN s ON c.nk = s.nk
      |ORDER BY nationkey""".stripMargin

  // ---------------------------------------------------------------- Q23
  /** Unpivot/melt: the inverse reshaping of q22 — per-status metric columns
    * back into (status, metric, value) long form via Spark's native unpivot
    * (a Generate, no shuffle); oracle via UNION ALL. */
  private[operators] def q23(spark: SparkSession, dir: String): DataFrame = {
    val wide = Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).cast(DoubleType).as("n_orders"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
    wide.unpivot(
      ids = Array(col("o_orderstatus")),
      values = Array(col("n_orders"), col("min_price"), col("max_price")),
      variableColumnName = "metric",
      valueColumnName = "value")
  }

  private[operators] lazy val q23Sql =
    """WITH wide AS (
      |  SELECT o_orderstatus,
      |    CAST(count(*) AS DOUBLE) AS n_orders,
      |    min(o_totalprice) AS min_price,
      |    max(o_totalprice) AS max_price
      |  FROM orders GROUP BY o_orderstatus)
      |SELECT o_orderstatus, 'n_orders' AS metric, n_orders AS value FROM wide
      |UNION ALL SELECT o_orderstatus, 'min_price', min_price FROM wide
      |UNION ALL SELECT o_orderstatus, 'max_price', max_price FROM wide""".stripMargin

  // ---------------------------------------------------------------- Q36
  /** SCHEMA-EVOLUTION READ — the lakehouse contract every long-lived table
    * eventually needs: generation 1 of the orders feed was written WITHOUT
    * the priority column, generation 2 added it; one `mergeSchema` read
    * unions the file schemas (missing columns null-filled per Parquet
    * semantics) and the aggregation treats legacy rows as their own
    * priority class. The generations are materialized once per (session,
    * dir) from the driver testdata — deterministic bytes, so re-runs and
    * the oracle agree. At 100 TB this is exactly how a schema migration
    * ships without rewriting history: new columns append, old files stay,
    * readers see the union. The oracle replays the same two-generation
    * union in SQL. */
  private[operators] lazy val schemaGenCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  private[operators] def q36(spark: SparkSession, dir: String): DataFrame = {
    val src = schemaGenCache.getOrElseUpdate((spark.sparkContext.applicationId, dir), {
      val d = graft.util.TempDirs.create("graft-schema-gens")
      val o = Tables.orders(spark, dir)
      o.filter(year(col("o_orderdate")) < 1996)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .write.parquet(d.resolve("gen1").toString)
      o.filter(year(col("o_orderdate")) >= 1996)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderpriority"))
        .write.parquet(d.resolve("gen2").toString)
      d.toString
    })
    spark.read.option("mergeSchema", "true")
      .parquet(s"$src/gen1", s"$src/gen2")
      .groupBy(coalesce(col("o_orderpriority"), lit("LEGACY")).as("priority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(dec(col("o_totalprice"))).cast(DoubleType), 2).as("total"))
  }

  private[operators] lazy val q36Sql =
    """WITH unioned AS (
      |  SELECT o_totalprice, NULL AS o_orderpriority FROM orders
      |  WHERE year(o_orderdate) < 1996
      |  UNION ALL
      |  SELECT o_totalprice, o_orderpriority FROM orders
      |  WHERE year(o_orderdate) >= 1996)
      |SELECT coalesce(o_orderpriority, 'LEGACY') AS priority,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
      |FROM unioned GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- Q37
  /** COHORT RETENTION TRIANGLE — the product-analytics table every
    * dashboard renders: users grouped by first-seen week, each cohort's
    * share still active k weeks later, in exact integer ppm. Three
    * aggregations, all keyed (user → (user, week) distinct → (cohort,
    * offset)): no window over the whole table, no self-cross; the cohort
    * dimension table is weeks-sized, broadcast onto the final join. At
    * 100 TB the (user, week) distinct is the only corpus-scale shuffle —
    * exactly the reach/retention computation's information-theoretic
    * minimum. Week offsets are integer µs arithmetic (no date interval
    * semantics to disagree on). */
  private[operators] def q37(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val first = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_week"))
    val act = ev.distinct()
    val sizes = first.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    act.join(first, "user_id")
      .withColumn("week_offset",
        expr("(unix_micros(cast(wk as timestamp)) - " +
          "unix_micros(cast(cohort_week as timestamp))) div 604800000000"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week").cast(TimestampNTZType).as("cohort_week"),
        col("week_offset"), col("n_active"),
        expr("(n_active * 1000000) div cohort_size").as("retention_ppm"))
  }

  private[operators] lazy val q37Sql =
    """WITH ew AS (SELECT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
      |  FROM events),
      |f AS (SELECT user_id, min(wk) AS cohort_week FROM ew GROUP BY 1),
      |act AS (SELECT DISTINCT user_id, wk FROM ew),
      |sizes AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
      |  FROM f GROUP BY 1),
      |r AS (SELECT f.cohort_week,
      |    (epoch_us(a.wk) - epoch_us(f.cohort_week)) // 604800000000 AS week_offset,
      |    CAST(count(*) AS BIGINT) AS n_active
      |  FROM act a JOIN f ON f.user_id = a.user_id
      |  GROUP BY 1, 2)
      |SELECT r.cohort_week, r.week_offset, r.n_active,
      |  (r.n_active * 1000000) // s.cohort_size AS retention_ppm
      |FROM r JOIN sizes s ON s.cohort_week = r.cohort_week""".stripMargin

  // ---------------------------------------------------------------- Q38
  /** SNAPSHOT DIFF (change-data-feed between two table generations — what
    * Delta CDF / `table_changes()` emits, and the primitive behind audit
    * trails and incremental downstream refresh). Two generations of the
    * orders table are derived deterministically from the same scan (rows
    * added, rows removed, a price-amendment cohort), then diffed with ONE
    * full-outer join on the key: `added` (new key), `removed` (key gone),
    * `changed` (both sides present, payload differs); unchanged rows are
    * filtered BEFORE projection so the output is delta-sized, not
    * table-sized. At 100 TB this is exactly two co-partitioned shuffles on
    * the primary key (AQE handles skew) and the emitted feed is
    * proportional to the churn — the information-theoretic minimum for a
    * diff. Prices are compared in exact integer cents (one IEEE
    * round-to-cents each side, then pure int64 arithmetic), so both
    * engines agree bit-for-bit; the +5% amendment is integral
    * (`cents * 105 div 100`). */
  private[operators] def q38(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey"),
      expr("cast(round(o_totalprice * 100, 0) as bigint)").as("cents"))
    // generation A: what existed "before" (keys %97==0 arrive later)
    val genA = o.filter(col("o_orderkey") % 97 =!= 0)
      .select(col("o_orderkey"), col("cents").as("old_cents"))
    // generation B: "after" — keys %89==0 were deleted, %13==0 re-priced
    val genB = o.filter(col("o_orderkey") % 89 =!= 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 13 === 0, expr("cents * 105 div 100"))
          .otherwise(col("cents")).as("new_cents"))
    genA.join(genB, Seq("o_orderkey"), "full_outer")
      .withColumn("change_type",
        when(col("old_cents").isNull, lit("added"))
          .when(col("new_cents").isNull, lit("removed"))
          .when(col("old_cents") =!= col("new_cents"), lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(col("o_orderkey"), col("change_type"),
        col("old_cents"), col("new_cents"))
  }

  private[operators] lazy val q38Sql =
    """WITH o AS (SELECT o_orderkey,
      |             CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
      |a AS (SELECT o_orderkey, cents AS old_cents FROM o WHERE o_orderkey % 97 <> 0),
      |b AS (SELECT o_orderkey,
      |        CASE WHEN o_orderkey % 13 = 0 THEN cents * 105 // 100
      |             ELSE cents END AS new_cents
      |      FROM o WHERE o_orderkey % 89 <> 0)
      |SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
      |  CASE WHEN a.o_orderkey IS NULL THEN 'added'
      |       WHEN b.o_orderkey IS NULL THEN 'removed'
      |       ELSE 'changed' END AS change_type,
      |  old_cents, new_cents
      |FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
      |WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
      |   OR old_cents <> new_cents""".stripMargin

  // ---------------------------------------------------------------- Q39
  /** MERGE / UPSERT APPLY — the other half of the CDC story: q38 DIFFS
    * two generations, q39 APPLIES that change feed to the base and must
    * reproduce the target generation exactly (`MERGE INTO base USING feed
    * WHEN MATCHED [AND removed] THEN DELETE / WHEN MATCHED THEN UPDATE /
    * WHEN NOT MATCHED THEN INSERT`). Declaratively that is ONE left-anti
    * join (untouched rows pass through) plus a union of the feed's
    * upserts — and because the feed is churn-sized, the anti join's build
    * side BROADCASTS: applying a day's changes to a 100 TB table costs
    * one scan of the base, no corpus shuffle. The oracle derives the
    * target generation directly, so the hash equality IS the round-trip
    * theorem: merge(base, diff(base, target)) = target. */
  private[operators] def q39(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 97 =!= 0)
      .select(col("o_orderkey"),
        expr("cast(round(o_totalprice * 100, 0) as bigint)").as("cents"))
    val feed = q38(spark, dir).persist() // read twice: key set + upserts
    // the CDC key set is residue-class = corpus-proportional, so its
    // broadcast is SIZE-GATED (the q44/x130 recipe; shuffle-hash past it)
    val untouched = base.join(
      gatedBroadcast(spark, feed.select(col("o_orderkey")),
        "spark.graft.merge.broadcastFeedCap"),
      Seq("o_orderkey"), "left_anti")
    val upserts = feed.filter(col("change_type").isin("added", "changed"))
      .select(col("o_orderkey"), col("new_cents").as("cents"))
    untouched.unionByName(upserts)
  }

  /** The target generation, derived directly — equality with the engine's
    * merge output is the round-trip proof. */
  private[operators] lazy val q39Sql =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 13 = 0
      |       THEN CAST(round(o_totalprice * 100) AS BIGINT) * 105 // 100
      |       ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS cents
      |FROM orders WHERE o_orderkey % 89 <> 0""".stripMargin

  // ---------------------------------------------------------------- Q40
  /** SCD2 POINT-IN-TIME LOOKUP — the read side of x37's type-2 dimension
    * and the join every warehouse fact table runs: each order resolves
    * to the dimension VERSION valid on its date (`valid_from ≤ d <
    * valid_to`, open version unbounded). Because x37's versions TILE each
    * customer's timeline from their first order onward, every order
    * matches exactly one non-empty interval — the spec pins that
    * exactly-one law, and a same-date priority flip (an empty interval)
    * can never match. Shape: one equi join on the customer key with the
    * validity predicate as a residual filter — the dimension is
    * versions-sized (broadcastable when it fits; AQE's call at 100 TB)
    * and the fact side never shuffles more than its join partitioning.
    * This is deliberately NOT a range-bucketed join: per customer the
    * version count is small, so the equi key already bounds the
    * candidates. */
  private[operators] def q40(spark: SparkSession, dir: String): DataFrame = {
    val dim = x37(spark, dir)
      .select(col("custkey"), col("version"), col("priority").as("dim_priority"),
        col("valid_from"), col("valid_to"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey").as("custkey"), col("o_orderdate"))
      .join(dim, Seq("custkey"))
      .filter(col("o_orderdate") >= col("valid_from") &&
        (col("valid_to").isNull || col("o_orderdate") < col("valid_to")))
      .select(col("o_orderkey"), col("custkey"), col("o_orderdate"),
        col("version"), col("dim_priority"))
  }

  private[operators] lazy val q40Sql =
    s"""WITH dim AS ($x37Sql)
       |SELECT o.o_orderkey, d.custkey, o.o_orderdate, d.version,
       |  d.priority AS dim_priority
       |FROM orders o JOIN dim d ON d.custkey = o.o_custkey
       |WHERE o.o_orderdate >= d.valid_from
       |  AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)""".stripMargin

  // ---------------------------------------------------------------- Q41
  /** COMPACTION PLAN — the lakehouse OPTIMIZE planner: given per-file
    * (here per-ship-month) row counts, pack TIME-CONTIGUOUS runs of
    * small files into ~12 equal-row compaction groups via a cumulative-
    * sum cut (`cum_before div target`) — contiguity is the point (the
    * table's time clustering survives the rewrite; x67's snake-order
    * planner is the non-contiguous balancing dual). Everything after the
    * ONE corpus aggregation runs on the |files| frame: the global window
    * is month-cardinality — domain-bounded, not data-bounded (the x50
    * argument), so the single-partition step never grows with the table.
    * Pure integer algebra (target = ceil-div), so both engines cut at
    * identical rows. At 100 TB the input is the file manifest the
    * catalog already holds; the plan is metadata in, metadata out. */
  private[operators] def q41(spark: SparkSession, dir: String): DataFrame = {
    val files = Tables.lineitem(spark, dir)
      .groupBy(date_trunc("month", col("l_shipdate")).as("mo"))
      .agg(count(lit(1)).as("n_rows"))
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wBefore = Window.orderBy(col("mo"))
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("total", sum(col("n_rows")).over(wAll))
      .withColumn("cum_before", coalesce(sum(col("n_rows")).over(wBefore), lit(0L)))
      .withColumn("grp", expr("cast(cum_before div ((total + 11) div 12) as int)"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_files"), sum(col("n_rows")).as("total_rows"),
        min(col("mo")).cast(TimestampNTZType).as("first_month"),
        max(col("mo")).cast(TimestampNTZType).as("last_month"))
  }

  private[operators] lazy val q41Sql =
    """WITH f AS (SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS mo,
      |             CAST(count(*) AS BIGINT) AS n_rows
      |           FROM lineitem GROUP BY 1),
      |c AS (SELECT *, CAST(sum(n_rows) OVER () AS BIGINT) AS total,
      |        CAST(coalesce(sum(n_rows) OVER (ORDER BY mo
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
      |      FROM f)
      |SELECT CAST(cum_before // ((total + 11) // 12) AS INT) AS grp,
      |  CAST(count(*) AS BIGINT) AS n_files, CAST(sum(n_rows) AS BIGINT) AS total_rows,
      |  min(mo) AS first_month, max(mo) AS last_month
      |FROM c GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- Q42
  /** SNAPSHOT-EXPIRY (VACUUM) PLAN — q41's maintenance dual: which data
    * files can be physically deleted once old table snapshots expire.
    * Table model (derived deterministically from orders): one snapshot
    * per order WEEK; week i's file lands as v1 at snapshot i and is
    * REWRITTEN as v2 at snapshot i+1 (late-arrival reconciliation), so
    * v1-of-i is referenced only by snapshot i while v2-of-i stays
    * current; the newest week's v1 is still live. Retention keeps the
    * last 4 snapshots, so a file is deletable iff EVERY snapshot
    * referencing it has expired — the Iceberg expire-snapshots
    * reachability rule, computed here as pure integer index algebra
    * (dense week index via a domain-bounded window, the x50 argument:
    * |weeks| rows, never |orders|). One corpus aggregation builds the
    * per-week manifest; the plan itself is metadata in, metadata out —
    * at 100 TB it reads the catalog's file listing, not the table. */
  /** The weekly commit+rewrite snapshot manifest q42 and q43 share (one
    * model, two consumers — planner and reader cannot drift): per order
    * week, row count, dense snapshot index, and the max index. */
  private[operators] def weeklySnapshots(spark: SparkSession, dir: String): DataFrame = {
    val weeks = Tables.orders(spark, dir)
      .groupBy(date_trunc("week", col("o_orderdate")).as("wk"))
      .agg(count(lit(1)).as("n_rows"))
    val wIdx = Window.orderBy(col("wk"))
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    weeks
      .withColumn("snap", dense_rank().over(wIdx))
      .withColumn("max_snap", max(col("snap")).over(wAll))
  }

  /** The matching SQL CTE body (w, i) — one text, both oracles. */
  private[operators] val weeklySnapshotsSqlBody =
    """w AS (SELECT CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS wk,
      |             CAST(count(*) AS BIGINT) AS n_rows
      |           FROM orders GROUP BY 1),
      |i AS (SELECT *, CAST(dense_rank() OVER (ORDER BY wk) AS INT) AS snap,
      |        CAST(count(*) OVER () AS INT) AS max_snap FROM w)""".stripMargin

  private[operators] def q42(spark: SparkSession, dir: String): DataFrame = {
    weeklySnapshots(spark, dir)
      .select(col("wk"), col("n_rows"), col("snap"), col("max_snap"),
        explode(array(lit(1), lit(2))).as("version"))
      // v2 only exists once the rewrite snapshot happened
      .filter(col("version") === 1 || col("snap") < col("max_snap"))
      .withColumn("added_snap",
        when(col("version") === 1, col("snap")).otherwise(col("snap") + 1))
      .withColumn("retired_snap",
        when(col("version") === 1 && col("snap") < col("max_snap"), col("snap") + 1))
      .withColumn("deletable",
        col("retired_snap").isNotNull && col("retired_snap") - 1 <= col("max_snap") - 4)
      .select(col("wk").cast(TimestampNTZType).as("file_week"),
        col("version"), col("n_rows"),
        col("added_snap").cast(IntegerType).as("added_snap"),
        col("retired_snap").cast(IntegerType).as("retired_snap"),
        col("deletable"))
  }

  private[operators] lazy val q42Sql =
    s"""WITH $weeklySnapshotsSqlBody,
      |f AS (SELECT *, unnest([1, 2]) AS version FROM i)
      |SELECT wk AS file_week, version, n_rows,
      |  CAST(CASE WHEN version = 1 THEN snap ELSE snap + 1 END AS INT) AS added_snap,
      |  CAST(CASE WHEN version = 1 AND snap < max_snap THEN snap + 1 END AS INT)
      |    AS retired_snap,
      |  (CASE WHEN version = 1 AND snap < max_snap THEN snap + 1 END) IS NOT NULL
      |    AND (CASE WHEN version = 1 AND snap < max_snap THEN snap + 1 END) - 1
      |        <= max_snap - 4 AS deletable
      |FROM f WHERE version = 1 OR snap < max_snap""".stripMargin

  // ---------------------------------------------------------------- Q43
  /** TIME-TRAVEL READ (AS OF snapshot) — the read-side dual of q42's
    * expiry planner, on the same weekly commit+rewrite file model: query
    * the table AS OF snapshot s = max_snap − 2. Snapshot isolation says
    * the live file set at s is {v2 of weeks < s} ∪ {v1 of week s} — the
    * manifest this query emits per week (version actually read, rows
    * served) plus each week's exact row count. The SPEC proves the
    * semantic theorem: the manifest's total equals the direct temporal
    * filter (orders with week-index ≤ s) — time travel reconstructs
    * history from metadata without rereading it. Same scale shape as
    * q42: one corpus aggregation, then |weeks|-bounded index algebra. */
  private[operators] def q43(spark: SparkSession, dir: String): DataFrame = {
    weeklySnapshots(spark, dir) // the SHARED q42 file model
      .withColumn("as_of", col("max_snap") - 2)
      .filter(col("snap") <= col("as_of"))
      .select(col("wk").cast(TimestampNTZType).as("file_week"),
        when(col("snap") < col("as_of"), 2).otherwise(1)
          .cast(IntegerType).as("version_read"),
        col("n_rows"),
        col("as_of").cast(IntegerType).as("as_of_snap"))
  }

  private[operators] lazy val q43Sql =
    s"""WITH $weeklySnapshotsSqlBody,
      |a AS (SELECT *, max_snap - 2 AS as_of FROM i)
      |SELECT wk AS file_week,
      |  CAST(CASE WHEN snap < as_of THEN 2 ELSE 1 END AS INT) AS version_read,
      |  n_rows, CAST(as_of AS INT) AS as_of_snap
      |FROM a WHERE snap <= as_of""".stripMargin

  // ---------------------------------------------------------------- Q27
  /** The distribution-window family q8 leaves out: ntile quartiles,
    * percent_rank, cume_dist, and frame-bound first/last values, per
    * market segment over customer account balances. All four are exact
    * rational functions of (rank, count) — deterministic given the unique
    * (c_acctbal, c_custkey) ordering. */
  private[operators] def q27(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    Tables.customer(spark, dir)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .withColumn("seg_min", first(col("c_acctbal")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("seg_max", last(col("c_acctbal")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
  }

  private[operators] lazy val q27Sql =
    """SELECT c_mktsegment, c_custkey, c_acctbal,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume,
      |  min(c_acctbal) OVER (PARTITION BY c_mktsegment) AS seg_min,
      |  max(c_acctbal) OVER (PARTITION BY c_mktsegment) AS seg_max
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)""".stripMargin

  // ---------------------------------------------------------------- Q26
  /** Banded RANGE JOIN with no equi key — the operator Spark has no native
    * strategy for (a naive `|a.ts - b.ts| <= δ` join plans as a nested
    * loop): for each purchase, how many clicks landed within ±60 s,
    * corpus-wide. The scalable decomposition buckets time at the band
    * width δ; a pair within δ must sit in the same or adjacent buckets, so
    * the probe side EXPLODES to its 3 candidate buckets and the join
    * becomes equi on the bucket id — a linear shuffle with per-bucket
    * locality, then the exact band filter. The 3× probe duplication is the
    * entire cost of turning O(n·m) into a hash join; dedup is unnecessary
    * because (bucket, click) candidates are distinct by construction. */
  private[operators] def q26(spark: SparkSession, dir: String): DataFrame = {
    val deltaUs = 60L * 1000000
    val ev = Tables.events(spark, dir).select(
      col("event_id"), col("event_type"),
      // session tz is pinned UTC, so NTZ→LTZ is the identity wall clock
      unix_micros(col("ts").cast(TimestampType)).as("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts_us").as("p_ts"))
      .withColumn("bkt", explode(array(
        expr(s"p_ts div $deltaUs") - 1, expr(s"p_ts div $deltaUs"), expr(s"p_ts div $deltaUs") + 1)))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("ts_us").as("c_ts"))
      .withColumn("bkt", expr(s"c_ts div $deltaUs"))
    purchases.join(clicks, Seq("bkt"))
      .filter(abs(col("c_ts") - col("p_ts")) <= deltaUs)
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_nearby_clicks"))
  }

  private[operators] lazy val q26Sql =
    """SELECT p.event_id AS purchase_id, count(*) AS n_nearby_clicks
      |FROM events p JOIN events c
      |  ON p.event_type = 'purchase' AND c.event_type = 'click'
      | AND abs(epoch_us(c.ts) - epoch_us(p.ts)) <= 60000000
      |GROUP BY p.event_id""".stripMargin

  // ---------------------------------------------------------------- Q29
  /** Time-series GAP-FILL + RESAMPLE (the metrics/feature-engineering
    * primitive Spark has no built-in for): per-user daily purchase spend
    * resampled onto each user's contiguous [first-day, last-day] calendar
    * grid, with forward-filled spend on gap days and an exact running
    * total. The grid is `sequence()` + `explode` (linear in emitted days,
    * no join against a global calendar table), the fill is
    * `last(_, ignoreNulls)` over an ordered per-user window — ONE shuffle
    * by user_id total, and at 100 TB the per-user day spans keep the
    * expansion proportional to the output, never |users| × |calendar|.
    * Sums stay DECIMAL until one final cast+round (engine-identical). */
  private[operators] def q29(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(dec(col("value"))).as("spend_dec"))
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(expr("sequence(d0, d1)")).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .withColumn("spend_ffill",
        round(last(col("spend_dec"), ignoreNulls = true).over(w).cast(DoubleType), 2))
      .withColumn("is_gap", col("spend_dec").isNull)
      .withColumn("cum_spend",
        round(sum(coalesce(col("spend_dec"), lit(0))).over(w).cast(DoubleType), 2))
      .select(col("user_id"), col("day"), col("spend_ffill"), col("is_gap"), col("cum_spend"))
  }

  private[operators] lazy val q29Sql =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |         sum(CAST(value AS DECIMAL(18,2))) AS spend_dec
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
      |grid AS (SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |         FROM span),
      |j AS (SELECT g.user_id, g.day, d.spend_dec FROM grid g LEFT JOIN daily d USING (user_id, day))
      |SELECT user_id, day,
      |  round(CAST(last_value(spend_dec IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS spend_ffill,
      |  spend_dec IS NULL AS is_gap,
      |  round(CAST(sum(coalesce(spend_dec, 0)) OVER (PARTITION BY user_id ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS cum_spend
      |FROM j""".stripMargin

  // ---------------------------------------------------------------- Q30
  /** The SQL-TEXT interface — the same engine driven entirely through
    * `spark.sql` over registered views (what a BI tool or a SQL-first user
    * sends): CTE + three-table join + decimal aggregation + ranking window,
    * planned by the identical Catalyst session (broadcast dims and all).
    * Views are prefixed `g_` so the registration never collides with the
    * executor's catalog tables (q28). */
  private[operators] def q30(spark: SparkSession, dir: String): DataFrame = {
    Seq("orders", "customer", "nation").foreach(t =>
      Tables(spark, dir, t).createOrReplaceTempView(s"g_$t"))
    spark.sql(
      """WITH rev AS (
        |  SELECT n.n_name, sum(cast(o.o_totalprice as decimal(18,2))) AS total
        |  FROM g_orders o
        |  JOIN g_customer c ON o.o_custkey = c.c_custkey
        |  JOIN g_nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY n.n_name)
        |SELECT n_name, round(cast(total as double), 2) AS total_price,
        |  cast(rank() OVER (ORDER BY total DESC, n_name) as int) AS rnk
        |FROM rev""".stripMargin)
  }

  private[operators] lazy val q30Sql =
    """WITH rev AS (
      |  SELECT n.n_name, sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS total
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY n.n_name)
      |SELECT n_name, round(CAST(total AS DOUBLE), 2) AS total_price,
      |  CAST(rank() OVER (ORDER BY total DESC, n_name) AS INT) AS rnk
      |FROM rev""".stripMargin

  // ---------------------------------------------------------------- Q31
  /** FUNNEL ANALYSIS — ordered sequential-pattern detection (the
    * match_recognize workload, product-analytics style): users who
    * signed up, then clicked within 48 h of the signup, then purchased
    * within 48 h of that click — each stage anchored at the PREVIOUS
    * stage's first qualifying event. Three stage aggregations, each an
    * equi-join on user + a time-range filter + min() — all shuffles keyed
    * by user, no window over the whole table, no self-cross; at 100 TB
    * each stage's state is one row per surviving user. The output is the
    * 3-row funnel with top-of-funnel conversion rates (exact n/n₁). */
  private[operators] def q31(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).persist() // three stage scans share the read
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id")
      .filter(col("ts") > col("t1") && col("ts") <= col("t1") + expr("INTERVAL 48 HOURS"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id")
      .filter(col("ts") > col("t2") && col("ts") <= col("t2") + expr("INTERVAL 48 HOURS"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val counts = s1.agg(count(lit(1)).as("n_users")).withColumn("step_no", lit(1))
      .withColumn("step", lit("signup"))
      .unionByName(s2.agg(count(lit(1)).as("n_users")).withColumn("step_no", lit(2))
        .withColumn("step", lit("click_within_48h")))
      .unionByName(s3.agg(count(lit(1)).as("n_users")).withColumn("step_no", lit(3))
        .withColumn("step", lit("purchase_within_48h")))
    val w = Window.orderBy(col("step_no"))
    counts
      .withColumn("conv_from_top",
        round(col("n_users").cast(DoubleType) /
          first(col("n_users")).over(w).cast(DoubleType), 6))
      .select(col("step_no"), col("step"), col("n_users"), col("conv_from_top"))
  }

  private[operators] lazy val q31Sql =
    """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 ON e.user_id = s1.user_id
      |       WHERE e.event_type = 'click' AND e.ts > s1.t1
      |         AND e.ts <= s1.t1 + INTERVAL 48 HOUR GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 ON e.user_id = s2.user_id
      |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      |         AND e.ts <= s2.t2 + INTERVAL 48 HOUR GROUP BY 1),
      |counts AS (
      |  SELECT 1 AS step_no, 'signup' AS step, (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_users
      |  UNION ALL SELECT 2, 'click_within_48h', (SELECT count(*) FROM s2)
      |  UNION ALL SELECT 3, 'purchase_within_48h', (SELECT count(*) FROM s3))
      |SELECT step_no, step, n_users,
      |  round(CAST(n_users AS DOUBLE) /
      |    CAST(first_value(n_users) OVER (ORDER BY step_no) AS DOUBLE), 6) AS conv_from_top
      |FROM counts""".stripMargin

  // ---------------------------------------------------------------- Q33
  /** REFERENTIAL-INTEGRITY AUDIT — the warehouse data-quality sweep (dbt
    * relationship tests, Deequ-style): every foreign-key edge of the star
    * schema checked by an ANTI join, reporting orphan counts and rates.
    * Clean data reports zeros — the report being hash-gated is the point
    * (a regression that drops FK integrity flips the gate); the spec
    * corrupts a copy in-memory and proves the same plan detects it. Each
    * edge is one broadcast/shuffled anti join + a 1-row count — the
    * cheapest possible audit shape, and at 100 TB the parent key sets are
    * the broadcast side. */
  private[operators] def q33(spark: SparkSession, dir: String): DataFrame = {
    def edge(name: String, child: DataFrame, ck: String,
        parent: DataFrame, pk: String): DataFrame =
      child.select(col(ck)).join(parent.select(col(pk)),
          col(ck) === col(pk), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .crossJoin(child.agg(count(lit(1)).as("n_total")))
        .select(lit(name).as("fk"), col("n_orphans"), col("n_total"),
          round(col("n_orphans").cast(DoubleType) / col("n_total"), 6).as("orphan_rate"))
    val li = Tables.lineitem(spark, dir)
    edge("orders->customer", Tables.orders(spark, dir), "o_custkey",
        Tables.customer(spark, dir), "c_custkey")
      .unionByName(edge("lineitem->orders", li, "l_orderkey",
        Tables.orders(spark, dir), "o_orderkey"))
      .unionByName(edge("lineitem->part", li, "l_partkey",
        Tables.part(spark, dir), "p_partkey"))
      .unionByName(edge("lineitem->supplier", li, "l_suppkey",
        Tables.supplier(spark, dir), "s_suppkey"))
  }

  private[operators] lazy val q33Sql =
    """SELECT 'orders->customer' AS fk, CAST(count(*) AS BIGINT) AS n_orphans,
      |  CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_total,
      |  round(CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM orders), 6) AS orphan_rate
      |FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |UNION ALL
      |SELECT 'lineitem->orders', count(*), (SELECT count(*) FROM lineitem),
      |  round(CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM lineitem), 6)
      |FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |UNION ALL
      |SELECT 'lineitem->part', count(*), (SELECT count(*) FROM lineitem),
      |  round(CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM lineitem), 6)
      |FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
      |UNION ALL
      |SELECT 'lineitem->supplier', count(*), (SELECT count(*) FROM lineitem),
      |  round(CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM lineitem), 6)
      |FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)""".stripMargin

  // ---------------------------------------------------------------- Q34
  /** ROLLING WINDOW STATISTICS — 7-day moving average and volatility of
    * daily spend per user over q29's gap-filled calendar grid (gap days
    * count as 0 — that is what a calendar-window metric means). The frame
    * sums run over integer CENTS (exact, order-free) and the mean/σ are
    * fixed-order IEEE on top — the q18/x48 moments recipe applied to
    * sliding frames. One shuffle by user; frames never leave the
    * partition. This is the feature-engineering primitive behind every
    * "7d_avg_spend"-style training feature. */
  private[operators] def q34(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(dec(col("value"))).as("spend_dec"))
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(expr("sequence(d0, d1)")).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day")).rowsBetween(-6, 0)
    grid.join(daily, Seq("user_id", "day"), "left")
      .withColumn("cents", coalesce(round(col("spend_dec") * 100, 0), lit(0)).cast(LongType))
      .withColumn("s", sum(col("cents")).over(w))
      .withColumn("ss", sum(col("cents") * col("cents")).over(w))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("mean", (col("s").cast(DoubleType) / col("n")) / lit(100.0))
      .select(col("user_id"), col("day"),
        round(col("mean"), 6).as("roll_avg"),
        round(sqrt(greatest(
          (col("ss").cast(DoubleType) / col("n")) / lit(10000.0) - col("mean") * col("mean"),
          lit(0.0))), 6).as("roll_std"),
        col("n").cast(IntegerType).as("n_days"))
  }

  private[operators] lazy val q34Sql =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |         sum(CAST(value AS DECIMAL(18,2))) AS spend_dec
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
      |grid AS (SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |         FROM span),
      |j AS (SELECT g.user_id, g.day,
      |        CAST(coalesce(round(d.spend_dec * 100), 0) AS BIGINT) AS cents
      |      FROM grid g LEFT JOIN daily d USING (user_id, day)),
      |r AS (SELECT user_id, day,
      |        sum(cents) OVER w AS s, sum(cents * cents) OVER w AS ss,
      |        count(*) OVER w AS n
      |      FROM j WINDOW w AS (PARTITION BY user_id ORDER BY day
      |        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      |SELECT user_id, day,
      |  round((CAST(s AS DOUBLE) / n) / 100.0, 6) AS roll_avg,
      |  round(sqrt(greatest((CAST(ss AS DOUBLE) / n) / 10000.0
      |    - ((CAST(s AS DOUBLE) / n) / 100.0) * ((CAST(s AS DOUBLE) / n) / 100.0), 0.0)), 6) AS roll_std,
      |  CAST(n AS INT) AS n_days
      |FROM r""".stripMargin

  // ---------------------------------------------------------------- X121
  /** INCREMENTAL AGGREGATE MAINTENANCE (IVM for SUM/COUNT) — the other
    * half of x110's theorem: a standing per-key aggregate over
    * generation A is brought to generation B by applying ONLY the CDC
    * delta — count' = count + Σinserts − Σdeletes, cents' likewise —
    * never rescanning the base. The delta here is the x110 fixture
    * convention on events: every (event_id % 89 = 0) row is DELETED and
    * every (event_id % 97 = 0, % 89 ≠ 0) row re-arrives as an INSERT
    * with a shifted id (a correction feed). SUM/COUNT are
    * self-maintainable (no per-key history needed — unlike MIN/MAX,
    * which revert to x110's rebuild-the-dirty-keys shape on deletes);
    * the maintenance cost is one aggregation over the DELTA plus a
    * |keys|-row outer merge against the standing aggregate. The oracle
    * is the FULL REBUILD over generation B — equality is the IVM
    * theorem. At 100 TB: the standing aggregate is the stored artifact,
    * the delta is the day's CDC feed, and this query touches only the
    * latter. */
  private[operators] def x121(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        expr("cast(round(value * 100, 0) as bigint)").as("cents"))
    // the standing aggregate over generation A (in production: the artifact)
    val standing = base.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
    // the CDC delta: deletes carry weight -1, inserts +1 — one frame, so
    // the delta aggregation is a single pass over the feed
    val deletes = base.filter(col("event_id") % 89 === 0)
      .select(col("event_type"), col("cents"), lit(-1L).as("w"))
    val inserts = base.filter(col("event_id") % 97 === 0 && col("event_id") % 89 =!= 0)
      .select(col("event_type"), col("cents"), lit(1L).as("w"))
    val deltaAgg = deletes.unionByName(inserts)
      .groupBy(col("event_type"))
      .agg(sum(col("w")).as("dn"), sum(col("w") * col("cents")).as("dcents"))
    standing.join(deltaAgg, Seq("event_type"), "full_outer")
      .select(col("event_type"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("sum_cents"), lit(0L)) + coalesce(col("dcents"), lit(0L)))
          .as("sum_cents"))
      .filter(col("n") > 0)
  }

  /** Full rebuild over generation B — equality is the IVM theorem. */
  private[operators] lazy val x121Sql =
    """WITH b AS (SELECT event_id, event_type,
      |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      |genB AS (
      |  SELECT event_type, cents FROM b WHERE event_id % 89 <> 0
      |  UNION ALL
      |  SELECT event_type, cents FROM b WHERE event_id % 97 = 0 AND event_id % 89 <> 0)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM genB GROUP BY event_type HAVING count(*) > 0""".stripMargin

  // ---------------------------------------------------------------- X131
  /** SAMPLED-QUANTILE ESTIMATOR + EXACT SELF-AUDIT — the missing member
    * of the approximate-algorithms family (HLL q10b, Misra–Gries
    * x57/qs25, MinHash/SimHash/Bloom): estimate p50/p90/p99 from a
    * CONTENT-ADDRESSED 1/64 sample (md5 of the integer row key — no RNG
    * state, reproducible from the corpus alone, and both engines draw
    * the IDENTICAL sample, so the FULL algorithm carries a DuckDB
    * oracle), then audit each estimate exactly: its true rank in the
    * corpus, the target rank, the error in ppm, and a 3σ acceptance
    * flag computed as the pure integer comparison
    *   err_ppm² · m ≤ 9 · p · (100 − p) · 10⁸
    * (the binomial σ² = p(1−p)/m bound with no sqrt, no doubles).
    * Scale shape: the sample predicate is map-side (one scan), the k-th
    * order statistics are TakeOrdered over the ~n/64 sample, and all
    * three true ranks ride ONE corpus aggregation of conditional sums —
    * two bounded passes, the x104 discipline with an estimator in
    * front. */
  private[operators] def x131(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_extendedprice").as("v"),
        col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
    val n = li.count()
    val sample = li.filter(expr(
      """CAST(conv(substr(md5(concat(CAST(ok AS STRING), '_', CAST(ln AS STRING))), 1, 12),
        |     16, 10) AS BIGINT) % 64 = 0""".stripMargin))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val m = sample.count()
    require(m > 0, s"x131: the 1/64 content-addressed sample is empty (n=$n) — " +
      "the estimator needs at least one sampled row; lower the modulus for tiny corpora")
    val pcts = Seq(50, 90, 99)
    // r8: the k-th statistic routes by SIZE — TakeOrdered materializes k
    // rows on one task, fine for small ranks, an OOM long before the
    // Int.MaxValue guard at a 100 TB sample; past the cap the rank goes
    // through the shared histogram refinement (x104's recipe: one
    // 1024-bucket pass names the bucket holding rank k, TakeOrdered then
    // runs on the ~m/1024-row bucket only). Both paths return the same
    // order statistic by construction (ties in v need no tie-break: the
    // k-th v under (v, ok, ln) order IS the k-th smallest v).
    val toCap = spark.conf.getOption("spark.graft.quantile.takeOrderedCap")
      .map(_.toLong).getOrElse(100000000L)
    val ests = pcts.map { p =>
      val k = math.max(1L, (2L * p * m + 100) / 200)
      val est =
        if (k <= toCap) {
          require(k <= Int.MaxValue,
            s"x131: sample rank $k exceeds Int.MaxValue — lower the takeOrderedCap")
          sample.orderBy(col("v").asc, col("ok").asc, col("ln").asc)
            .limit(k.toInt).agg(max(col("v"))).head().getDouble(0)
        } else kthSmallestByHistogram(sample, "v", k)
      (p, est)
    }
    val rankCols = ests.map { case (p, e) =>
      sum(when(col("v") <= e, 1L).otherwise(0L)).as(s"r$p")
    }
    val ranks = li.agg(rankCols.head, rankCols.tail: _*).head()
    val rows = ests.zipWithIndex.map { case ((p, e), i) =>
      val trueRank = ranks.getLong(i)
      val target = (2L * p * n + 100) / 200
      val errPpm = (2 * math.abs(trueRank - target) * 1000000L + n) / (2 * n)
      val within = BigInt(errPpm) * errPpm * m <= BigInt(9L) * p * (100 - p) * 100000000L
      (p, e, m, trueRank, target, errPpm, within)
    }
    sample.unpersist()
    import spark.implicits._
    rows.toDF("pct", "est_price", "sample_size", "true_rank",
      "target_rank", "err_ppm", "within_3sigma")
  }

  private[operators] lazy val x131Sql =
    """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem),
      |s AS MATERIALIZED (SELECT l_extendedprice AS v, l_orderkey AS ok,
      |       l_linenumber AS ln FROM lineitem
      |     WHERE ('0x' || substr(md5(l_orderkey::VARCHAR || '_' || l_linenumber::VARCHAR),
      |            1, 12))::BIGINT % 64 = 0),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM s),
      |r AS MATERIALIZED (SELECT v, CAST(row_number() OVER (ORDER BY v, ok, ln) AS BIGINT)
      |       AS rn FROM s),
      |p AS (SELECT unnest([50, 90, 99]) AS pct),
      |k AS (SELECT pct, greatest(1, (2 * pct * (SELECT m FROM m) + 100) // 200) AS kk
      |      FROM p),
      |est AS MATERIALIZED (SELECT pct,
      |        (SELECT v FROM r WHERE rn = k.kk) AS est_price FROM k),
      |tr AS MATERIALIZED (SELECT pct, est_price,
      |        (SELECT CAST(count(*) AS BIGINT) FROM lineitem
      |         WHERE l_extendedprice <= est_price) AS true_rank
      |      FROM est),
      |fin AS (SELECT pct, est_price, (SELECT m FROM m) AS sample_size, true_rank,
      |        (2 * pct * (SELECT n FROM n) + 100) // 200 AS target_rank FROM tr)
      |SELECT pct, est_price, sample_size, true_rank, target_rank,
      |  (2 * abs(true_rank - target_rank) * 1000000 + (SELECT n FROM n))
      |    // (2 * (SELECT n FROM n)) AS err_ppm,
      |  CAST((2 * abs(true_rank - target_rank) * 1000000 + (SELECT n FROM n))
      |    // (2 * (SELECT n FROM n)) AS HUGEINT)
      |    * ((2 * abs(true_rank - target_rank) * 1000000 + (SELECT n FROM n))
      |       // (2 * (SELECT n FROM n))) * sample_size
      |    <= CAST(9 AS HUGEINT) * pct * (100 - pct) * 100000000 AS within_3sigma
      |FROM fin""".stripMargin

  // ---------------------------------------------------------------- X125
  /** JOIN-CARDINALITY ESTIMATION SCORECARD — the CBO-statistics audit a
    * warehouse runs before trusting its optimizer: for each core FK join,
    * the textbook uniform-NDV estimate |R|·|S| / max(ndv_R, ndv_S)
    * against the TRUE join size, with the error as exact integer ppm.
    * The true size is computed the scale-correct way: as the dot product
    * of the two per-key FREQUENCY tables (Σ f_R(k)·f_S(k)) — one keyed
    * aggregation per side plus a key-domain-bounded join, so the joined
    * rows themselves are never materialized (at 100 TB the whole point
    * of estimating a join is not paying for it; the audit shouldn't
    * either). All arithmetic is half-up integer rationals over
    * DECIMAL(38,0)/HUGEINT — no doubles anywhere. */
  private[operators] def x125(spark: SparkSession, dir: String): DataFrame = {
    def score(name: String, l: DataFrame, r: DataFrame): DataFrame = {
      val fl = l.groupBy(col("k")).agg(count(lit(1)).as("cl"))
      val fr = r.groupBy(col("k")).agg(count(lit(1)).as("cr"))
      val sl = fl.agg(sum(col("cl")).as("n_left"), count(lit(1)).as("ndv_left"))
      val sr = fr.agg(sum(col("cr")).as("n_right"), count(lit(1)).as("ndv_right"))
      val act = fl.join(fr, "k")
        .agg(coalesce(sum(col("cl") * col("cr")), lit(0L)).as("actual_rows"))
      sl.crossJoin(sr).crossJoin(act) // three 1-row frames
        .withColumn("join_name", lit(name))
        .withColumn("est_rows", expr(
          """CAST((2 * CAST(n_left AS DECIMAL(38,0)) * n_right
            |  + greatest(ndv_left, ndv_right))
            |  div (2 * greatest(ndv_left, ndv_right)) AS BIGINT)""".stripMargin))
        .withColumn("err_ppm", expr(
          """CAST((2 * CAST(est_rows AS DECIMAL(38,0)) * 1000000 + actual_rows)
            |  div (2 * actual_rows) AS BIGINT)""".stripMargin))
        .select(col("join_name"), col("n_left"), col("n_right"),
          col("ndv_left"), col("ndv_right"), col("est_rows"),
          col("actual_rows"), col("err_ppm"))
    }
    val li = Tables.lineitem(spark, dir)
    score("orders_customer",
        Tables.orders(spark, dir).select(col("o_custkey").as("k")),
        Tables.customer(spark, dir).select(col("c_custkey").as("k")))
      .union(score("lineitem_orders",
        li.select(col("l_orderkey").as("k")),
        Tables.orders(spark, dir).select(col("o_orderkey").as("k"))))
      .union(score("lineitem_part",
        li.select(col("l_partkey").as("k")),
        Tables.part(spark, dir).select(col("p_partkey").as("k"))))
  }

  private[operators] lazy val x125Sql = {
    def one(name: String, lt: String, lk: String, rt: String, rk: String) =
      s"""SELECT '$name' AS join_name, n_left, n_right, ndv_left, ndv_right,
         |  CAST((2 * CAST(n_left AS HUGEINT) * n_right + greatest(ndv_left, ndv_right))
         |       // (2 * greatest(ndv_left, ndv_right)) AS BIGINT) AS est_rows,
         |  actual_rows,
         |  CAST((2 * CAST((2 * CAST(n_left AS HUGEINT) * n_right + greatest(ndv_left, ndv_right))
         |       // (2 * greatest(ndv_left, ndv_right)) AS HUGEINT) * 1000000 + actual_rows)
         |       // (2 * actual_rows) AS BIGINT) AS err_ppm
         |FROM (SELECT CAST(count(*) AS BIGINT) AS n_left,
         |        CAST(count(DISTINCT $lk) AS BIGINT) AS ndv_left FROM $lt),
         |     (SELECT CAST(count(*) AS BIGINT) AS n_right,
         |        CAST(count(DISTINCT $rk) AS BIGINT) AS ndv_right FROM $rt),
         |     (SELECT CAST(coalesce(sum(cl * cr), 0) AS BIGINT) AS actual_rows FROM
         |        (SELECT $lk AS k, CAST(count(*) AS BIGINT) AS cl FROM $lt GROUP BY 1) fl
         |        JOIN (SELECT $rk AS k, CAST(count(*) AS BIGINT) AS cr FROM $rt GROUP BY 1) fr
         |        USING (k))""".stripMargin
    Seq(
      one("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
      one("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      one("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"))
      .mkString("", "\nUNION ALL\n", "")
  }

  // ---------------------------------------------------------------- Q44
  /** INCREMENTAL JOIN-VIEW MAINTENANCE — the join leg of the IVM family
    * (x121 maintains an aggregate, x130 a clustering; this maintains an
    * equi-JOIN view): the standing view V = A ⨝ B absorbs deltas on BOTH
    * sides via the delta algebra
    *   ΔV = ΔA ⨝ B  ∪  A ⨝ ΔB  ∪  ΔA ⨝ ΔB
    * (A, B are the PRE-delta states — the cross term appears exactly
    * once). Deltas here are the o_orderkey%10 / c_custkey%17 residue
    * classes; the oracle is the FULL recomputed join — equality is the
    * IVM theorem, the x130 discipline. Scale shape: the base join is the
    * standing artifact (rebuilt in-query only because the registry is
    * stateless; production reads it), and each delta leg routes through
    * a SIZE GATE (`spark.graft.ivm.broadcastDeltaCap`, rows — in
    * production the manifest knows delta sizes for free): a bounded
    * delta broadcasts; past the cap the leg becomes a SHUFFLE HASH join
    * — still delta-proportional (the base never joins the base; the
    * shuffle carries base rows keyed only where a delta key exists) and
    * never an 8 GB-capped driver broadcast of a corpus-proportional
    * residue class. Both paths are proven output-identical in PlansSpec
    * at cap 0. Output folds the maintained view to per-segment exact
    * counts/cents so the theorem is hash-gated, not row-dumped. */
  private[operators] def q44(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"),
      expr("cast(round(o_totalprice * 100, 0) as bigint)").as("cents"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"))
    val dOrd = col("o_orderkey") % 10 === 0
    val dCust = col("c_custkey") % 17 === 0
    val a = ord.filter(!dOrd); val da = ord.filter(dOrd)
    val b = cust.filter(!dCust); val db = cust.filter(dCust)
    val key = col("o_custkey") === col("c_custkey")
    val gda = gatedBroadcast(spark, da, "spark.graft.ivm.broadcastDeltaCap")
    val gdb = gatedBroadcast(spark, db, "spark.graft.ivm.broadcastDeltaCap")
    val base = a.join(b, key)                      // the standing view
    val leg1 = gda.join(b, key)                    // dA join B
    val leg2 = a.join(gdb, key)                    // A join dB
    val leg3 = gda.join(gdb, key)                  // dA join dB
    base.unionByName(leg1).unionByName(leg2).unionByName(leg3)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sum_cents"))
  }

  private[operators] lazy val q44Sql =
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- Q45
  /** INCLUSION-DEPENDENCY (FK-candidate) PROFILER — the schema-discovery
    * pass a warehouse runs before trusting joins: for each candidate
    * child.col -> parent.key, the exact containment coefficient
    * |distinct(child) ∩ distinct(parent)| / |distinct(child)| as a
    * half-up ppm, and an is_fk flag at containment = 1. The five real
    * TPC-H dependencies must score 10^6; a deliberate negative control
    * (o_orderkey -> c_custkey) shows the profiler rejects. Scale shape:
    * each candidate is ONE distinct-aggregate on the child column
    * (map-side combined) plus a left join against the parent's distinct
    * keys — never a row-level join, so cost is keyed by NDV, not table
    * size; dimension-side distinct sets broadcast. */
  private[operators] def q45(spark: SparkSession, dir: String): DataFrame = {
    def dep(label: String, child: DataFrame, cc: String,
        parent: DataFrame, pc: String): DataFrame = {
      val cd = child.select(col(cc).cast(LongType).as("k")).filter(col("k").isNotNull).distinct()
      val pd = parent.select(col(pc).cast(LongType).as("k")).filter(col("k").isNotNull).distinct()
        .withColumn("hit", lit(1L))
      cd.join(pd, Seq("k"), "left")
        .agg(count(lit(1)).as("n_child_keys"),
          sum(coalesce(col("hit"), lit(0L))).as("n_contained"))
        .select(lit(label).as("dependency"), col("n_child_keys"), col("n_contained"),
          expr("(2 * n_contained * 1000000 + n_child_keys) div (2 * n_child_keys)")
            .as("containment_ppm"),
          (col("n_contained") === col("n_child_keys")).as("is_fk"))
    }
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    Seq(
      dep("orders.o_custkey->customer.c_custkey", ord, "o_custkey", cust, "c_custkey"),
      dep("lineitem.l_orderkey->orders.o_orderkey", li, "l_orderkey", ord, "o_orderkey"),
      dep("lineitem.l_partkey->part.p_partkey", li, "l_partkey",
        Tables.part(spark, dir), "p_partkey"),
      dep("lineitem.l_suppkey->supplier.s_suppkey", li, "l_suppkey",
        Tables.supplier(spark, dir), "s_suppkey"),
      dep("customer.c_nationkey->nation.n_nationkey", cust, "c_nationkey",
        Tables.nation(spark, dir), "n_nationkey"),
      dep("orders.o_orderkey->customer.c_custkey", ord, "o_orderkey", cust, "c_custkey"))
      .reduce(_ unionByName _)
  }

  private[operators] lazy val q45Sql = {
    def one(label: String, ct: String, cc: String, pt: String, pc: String) =
      s"""SELECT '$label' AS dependency,
         |  CAST(count(*) AS BIGINT) AS n_child_keys,
         |  CAST(sum(CASE WHEN p.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contained,
         |  CAST((2 * CAST(sum(CASE WHEN p.k IS NOT NULL THEN 1 ELSE 0 END) AS HUGEINT) * 1000000
         |        + count(*)) // (2 * count(*)) AS BIGINT) AS containment_ppm,
         |  sum(CASE WHEN p.k IS NOT NULL THEN 1 ELSE 0 END) = count(*) AS is_fk
         |FROM (SELECT DISTINCT CAST($cc AS BIGINT) AS k FROM $ct WHERE $cc IS NOT NULL) c
         |LEFT JOIN (SELECT DISTINCT CAST($pc AS BIGINT) AS k FROM $pt WHERE $pc IS NOT NULL) p
         |  USING (k)""".stripMargin
    Seq(
      one("orders.o_custkey->customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey"),
      one("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      one("lineitem.l_partkey->part.p_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
      one("lineitem.l_suppkey->supplier.s_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      one("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
      one("orders.o_orderkey->customer.c_custkey", "orders", "o_orderkey", "customer", "c_custkey"))
      .mkString("", "\nUNION ALL\n", "")
  }

  // ---------------------------------------------------------------- X134
  /** JOIN-KEY SKEW AUDIT — the planner-side diagnosis every 100 TB
    * shuffle needs BEFORE it runs: per candidate join key, the exact key
    * count, top-1 key share, skew ratio (top-1 count over the mean key
    * count), and the salt factor a skew-mitigating rewrite would use
    * (ceil(top1/mean) — 1 means "no salting needed"). All integer-exact:
    * shares/ratios are half-up ppm rationals in DECIMAL(38,0)/HUGEINT
    * (top1·n_keys·10^6 outgrows int64 at corpus scale). Scale shape: one
    * map-side-combined count per key column, then a 3-scalar fold — the
    * audit costs one aggregation per key, never a join; this is the
    * measurement x24's salted aggregation and AQE's skew-join handling
    * consume as configuration. */
  private[operators] def x134(spark: SparkSession, dir: String): DataFrame = {
    def audit(label: String, df: DataFrame, c: String): DataFrame =
      df.filter(col(c).isNotNull).groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
          max(col("cnt")).as("top1_cnt"))
        .select(lit(label).as("join_key"), col("n_rows"), col("n_keys"), col("top1_cnt"),
          expr("cast((2 * cast(top1_cnt as decimal(38,0)) * 1000000 + n_rows) div (2 * n_rows) as bigint)")
            .as("top1_share_ppm"),
          expr("cast((2 * cast(top1_cnt as decimal(38,0)) * n_keys * 1000000 + n_rows) div (2 * n_rows) as bigint)")
            .as("skew_ratio_ppm"),
          expr("cast((cast(top1_cnt as decimal(38,0)) * n_keys + n_rows - 1) div n_rows as bigint)")
            .as("recommended_salt"))
    Seq(
      audit("events.user_id", Tables.events(spark, dir), "user_id"),
      audit("lineitem.l_orderkey", Tables.lineitem(spark, dir), "l_orderkey"),
      audit("lineitem.l_partkey", Tables.lineitem(spark, dir), "l_partkey"),
      audit("orders.o_custkey", Tables.orders(spark, dir), "o_custkey"))
      .reduce(_ unionByName _)
  }

  private[operators] lazy val x134Sql = {
    def one(label: String, t: String, c: String) =
      s"""SELECT '$label' AS join_key, n_rows, n_keys, top1_cnt,
         |  CAST((2 * CAST(top1_cnt AS HUGEINT) * 1000000 + n_rows)
         |       // (2 * n_rows) AS BIGINT) AS top1_share_ppm,
         |  CAST((2 * CAST(top1_cnt AS HUGEINT) * n_keys * 1000000 + n_rows)
         |       // (2 * n_rows) AS BIGINT) AS skew_ratio_ppm,
         |  CAST((CAST(top1_cnt AS HUGEINT) * n_keys + n_rows - 1)
         |       // n_rows AS BIGINT) AS recommended_salt
         |FROM (SELECT CAST(count(*) AS BIGINT) AS n_keys,
         |        CAST(sum(cnt) AS BIGINT) AS n_rows,
         |        CAST(max(cnt) AS BIGINT) AS top1_cnt
         |      FROM (SELECT CAST(count(*) AS BIGINT) AS cnt FROM $t
         |            WHERE $c IS NOT NULL GROUP BY $c))""".stripMargin
    Seq(
      one("events.user_id", "events", "user_id"),
      one("lineitem.l_orderkey", "lineitem", "l_orderkey"),
      one("lineitem.l_partkey", "lineitem", "l_partkey"),
      one("orders.o_custkey", "orders", "o_custkey"))
      .mkString("", "\nUNION ALL\n", "")
  }

}
