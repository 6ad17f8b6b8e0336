package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface of the engine (SURVEY.md §2.2–2.8).
  *
  * Each `OP-*` from the survey inventory is realized as a declarative
  * DataFrame query over the driver corpus, paired with an ANSI-SQL oracle
  * for DuckDB. The reference's fixed SQL strings
  * (`/root/reference/crates/storage/sqlite3/src/sqlite3.rs`,
  * `postgres/src/postgres.rs`) become Catalyst-planned queries: filters and
  * projections push down to the parquet scan, equi-joins broadcast when one
  * side is small, and aggregates run partial+final hash aggregation.
  *
  * Scale notes (100 TB design intent, tested at sf0.1):
  *  - every filter/projection here is expressible as a parquet pushdown
  *    (verified via `.explain` — `PushedFilters`/`ReadSchema`);
  *  - dimension joins (`customer`, `orders` at view-query cardinality) use
  *    explicit `broadcast()` hints; fact-fact joins rely on shuffle hash /
  *    sort-merge + AQE;
  *  - global-`orderBy` windows appear only in the gap/continuity checks
  *    (OP-WIN-1/2, mirroring verify.rs:48-79) where the input is pre-filtered
  *    to a bounded slice.
  */
object RelationalOps {

  private def q(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, fn, Some(oracle))

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.t(s, dir, name)

  // ---------------------------------------------------------------------
  // Filters / predicates (OP-FIL-*)
  // ---------------------------------------------------------------------

  /** OP-FIL-1 — ingest address filter: keep rows where either endpoint is in
    * a watched set (etl.rs:199-204 shape). */
  val fil1AddressFilter: GraftQuery = q(
    "fil1_set_membership",
    """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber
      |FROM lineitem WHERE l_suppkey IN (1, 3, 5) OR l_partkey IN (7, 11)
      |""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_suppkey").isin(1, 3, 5) || col("l_partkey").isin(7, 11))
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
  }

  /** OP-FIL-2 — equality point lookup (block-by-number shape,
    * sqlite3.rs:706-719). */
  val fil2PointLookup: GraftQuery = q(
    "fil2_point_lookup",
    "SELECT * FROM orders WHERE o_orderkey = 42") { (s, dir) =>
    t(s, dir, "orders").filter(col("o_orderkey") === 42)
  }

  /** OP-FIL-3 — equality scan: all txs of one block (sqlite3.rs:644-657). */
  val fil3EqualityScan: GraftQuery = q(
    "fil3_equality_scan",
    "SELECT * FROM lineitem WHERE l_orderkey = 7") { (s, dir) =>
    t(s, dir, "lineitem").filter(col("l_orderkey") === 7)
  }

  /** OP-FIL-4 — closed range predicate (blocks in [s,e],
    * sqlite3.rs:686-704). */
  val fil4Range: GraftQuery = q(
    "fil4_range",
    "SELECT * FROM orders WHERE o_orderkey >= 100 AND o_orderkey <= 120") {
    (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderkey") >= 100 && col("o_orderkey") <= 120)
  }

  /** OP-FIL-4 — open-ended range (end < 0 drops the upper bound). */
  val fil4RangeOpen: GraftQuery = q(
    "fil4_range_open",
    "SELECT * FROM orders WHERE o_orderkey >= 1450") { (s, dir) =>
    t(s, dir, "orders").filter(col("o_orderkey") >= 1450)
  }

  /** OP-FIL-5 — dynamic conjunctive predicate (`WHERE 1=1 [AND ...]`,
    * sqlite3.rs:556-568). The optional filters chain as `.filter` calls. */
  val fil5Conjunctive: GraftQuery = q(
    "fil5_conjunctive",
    "SELECT * FROM lineitem WHERE l_suppkey = 4 AND l_discount > 0.05") {
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_suppkey") === 4)
        .filter(col("l_discount") > 0.05)
  }

  /** OP-FIL-6 — disjunctive predicate per TransferType (from=x OR to=x,
    * sqlite3.rs:622-635). */
  val fil6Disjunctive: GraftQuery = q(
    "fil6_disjunctive",
    """SELECT * FROM orders
      |WHERE o_custkey = 13 OR o_orderpriority = '1-URGENT'""".stripMargin) {
    (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_custkey") === 13 || col("o_orderpriority") === "1-URGENT")
  }

  /** OP-FIL-7 — duplicate elimination (stream skip-filter analogue,
    * etl.rs:134-136). */
  val fil7Distinct: GraftQuery = q(
    "fil7_distinct",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem") { (s, dir) =>
    t(s, dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()
  }

  /** OP-FIL-8 — selector predicate: fixed-offset prefix of a payload column
    * against a selector set (etl.rs:353, cbc20.rs:25-32). */
  val fil8Selector: GraftQuery = q(
    "fil8_selector",
    """SELECT event_id, event_type, props FROM events
      |WHERE event_type = 'click' AND substr(props, 1, 6) IN ('{"k": ')
      |""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .filter(col("event_type") === "click" &&
        substring(col("props"), 1, 6).isin("{\"k\": "))
      .select("event_id", "event_type", "props")
  }

  // ---------------------------------------------------------------------
  // Projections (OP-PRJ-*)
  // ---------------------------------------------------------------------

  /** OP-PRJ-1 — narrow projection (5 of 9 transfer columns,
    * sqlite3.rs:588-591). Column pruning must reach the scan. */
  val prj1Narrow: GraftQuery = q(
    "prj1_narrow",
    """SELECT l_orderkey, l_partkey, l_suppkey, l_quantity, l_extendedprice
      |FROM lineitem""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice")
  }

  /** OP-PRJ-3 — derived timestamp column (created_at from epoch seconds,
    * sqlite3.rs:414 `%Y-%m-%d %H:%M:%S`). */
  val prj3Derived: GraftQuery = q(
    "prj3_derived",
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS created_at
      |FROM orders""".stripMargin) { (s, dir) =>
    t(s, dir, "orders").select(col("o_orderkey"),
      date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("created_at"))
  }

  /** OP-PRJ-4 — sentinel normalization: missing value -> "" instead of NULL
    * (transaction.rs:26-35). Round-trips NULL through a sentinel. */
  val prj4Sentinel: GraftQuery = q(
    "prj4_sentinel",
    """SELECT c_custkey,
      |  coalesce(nullif(c_mktsegment, 'BUILDING'), '') AS segment_sentinel
      |FROM customer""".stripMargin) { (s, dir) =>
    t(s, dir, "customer").select(col("c_custkey"),
      coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit(""))
        .as("segment_sentinel"))
  }

  /** OP-PRJ-5 / OP-FN-6 — hex rendering of an integer column
    * (encode_hex shape, block.rs:36-40; lowercase for parity). */
  val prj5Hex: GraftQuery = q(
    "prj5_hex",
    "SELECT o_orderkey, lower(hex(o_orderkey)) AS key_hex FROM orders") {
    (s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
        lower(hex(col("o_orderkey"))).as("key_hex"))
  }

  // ---------------------------------------------------------------------
  // Joins (OP-JOIN-*)
  // ---------------------------------------------------------------------

  /** OP-JOIN-1/3 — enrichment join: propagate parent attributes down two
    * levels (block->tx->transfer becomes order->lineitem with customer).
    * Dimension sides are broadcast, as the reference's in-memory HashMap
    * probes were (sqlite3.rs:407-415). */
  val join1Enrich: GraftQuery = q(
    "join1_enrich",
    """SELECT l.l_orderkey, l.l_linenumber, o.o_orderdate AS created_at,
      |       c.c_name AS customer_name
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin) {
    (s, dir) =>
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      li.join(broadcast(o), li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select(li("l_orderkey"), li("l_linenumber"),
          o("o_orderdate").as("created_at"), c("c_name").as("customer_name"))
  }

  /** OP-JOIN-2 — receipt-status left join + when/otherwise status flag
    * (etl.rs:357-371): rows with no match get status 0. */
  val join2Status: GraftQuery = q(
    "join2_status",
    """SELECT o.o_orderkey,
      |       CASE WHEN r.l_orderkey IS NOT NULL THEN 1 ELSE 0 END AS status
      |FROM orders o
      |LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem
      |           WHERE l_returnflag = 'R') r
      |  ON o.o_orderkey = r.l_orderkey""".stripMargin) { (s, dir) =>
    val o = t(s, dir, "orders")
    val receipts = t(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey").distinct()
    o.join(broadcast(receipts), o("o_orderkey") === receipts("l_orderkey"),
        "left")
      .select(o("o_orderkey"),
        when(receipts("l_orderkey").isNotNull, 1).otherwise(0).as("status"))
  }

  /** Left-semi join (EXISTS) — declared engine surface beyond the
    * reference (SURVEY §2.3). */
  val joinSemi: GraftQuery = q(
    "join_semi",
    """SELECT * FROM customer c WHERE EXISTS
      |  (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |   AND o.o_totalprice > 300000)""".stripMargin) { (s, dir) =>
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
  }

  /** Left-anti join (NOT EXISTS) — the reorg-delete materialization shape
    * (OP-JOIN-4 / OP-DEL-1). */
  val joinAnti: GraftQuery = q(
    "join_anti",
    """SELECT * FROM customer c WHERE NOT EXISTS
      |  (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |   AND o.o_orderpriority = '1-URGENT')""".stripMargin) { (s, dir) =>
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
  }

  /** Theta/range join (non-equi) — declared surface; bounded band to keep
    * the cross product small. Catalyst plans BroadcastNestedLoopJoin. */
  val joinTheta: GraftQuery = q(
    "join_theta",
    """SELECT s.s_suppkey, c.c_custkey FROM supplier s
      |JOIN customer c
      |  ON c.c_acctbal >= s.s_acctbal - 10 AND c.c_acctbal <= s.s_acctbal + 10
      |""".stripMargin) { (s, dir) =>
    val sup = t(s, dir, "supplier")
    val c = t(s, dir, "customer")
    sup.join(c, c("c_acctbal") >= sup("s_acctbal") - 10 &&
        c("c_acctbal") <= sup("s_acctbal") + 10)
      .select(sup("s_suppkey"), c("c_custkey"))
  }

  /** Full outer join — declared surface. */
  val joinFullOuter: GraftQuery = q(
    "join_full_outer",
    """SELECT n.n_nationkey, n.n_name, agg.cust_cnt FROM nation n
      |FULL OUTER JOIN (SELECT c_nationkey, count(*) AS cust_cnt
      |                 FROM customer GROUP BY c_nationkey) agg
      |  ON n.n_nationkey = agg.c_nationkey""".stripMargin) { (s, dir) =>
    val n = t(s, dir, "nation")
    val agg = t(s, dir, "customer").groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("cust_cnt"))
    n.join(agg, n("n_nationkey") === agg("c_nationkey"), "full_outer")
      .select(n("n_nationkey"), n("n_name"), agg("cust_cnt"))
  }

  // ---------------------------------------------------------------------
  // Aggregations (OP-AGG-*)
  // ---------------------------------------------------------------------

  /** OP-AGG-1 — global max (latest block number, sqlite3.rs:153-162). */
  val agg1Max: GraftQuery = q(
    "agg1_max",
    "SELECT max(o_orderkey) AS max_key FROM orders") { (s, dir) =>
    t(s, dir, "orders").agg(max(col("o_orderkey")).as("max_key"))
  }

  /** OP-AGG-2 — coalesced fallback max across three tables
    * (sqlite3.rs:153-211). */
  val agg2CoalescedMax: GraftQuery = q(
    "agg2_coalesced_max",
    """SELECT coalesce((SELECT max(o_orderkey) FROM orders),
      |                (SELECT max(l_orderkey) FROM lineitem),
      |                0) AS latest""".stripMargin) { (s, dir) =>
    val a = t(s, dir, "orders").agg(max(col("o_orderkey")).as("a"))
    val b = t(s, dir, "lineitem").agg(max(col("l_orderkey")).as("b"))
    a.crossJoin(b).select(coalesce(col("a"), col("b"), lit(0L)).as("latest"))
  }

  /** OP-AGG-3 — filter against a scalar-subquery max
    * (`number > max(number) - N`, sqlite3.rs:334-344). */
  val agg3ScalarSubquery: GraftQuery = q(
    "agg3_scalar_subquery",
    """SELECT * FROM orders
      |WHERE o_orderkey > (SELECT max(o_orderkey) - 100 FROM orders)
      |""".stripMargin) { (s, dir) =>
    t(s, dir, "orders").createOrReplaceTempView("graft_orders_a3")
    s.sql("""SELECT * FROM graft_orders_a3
            |WHERE o_orderkey > (SELECT max(o_orderkey) - 100
            |                    FROM graft_orders_a3)""".stripMargin)
  }

  /** OP-AGG-4 — per-group count (transaction_count derivation,
    * block.rs:59). */
  val agg4Count: GraftQuery = q(
    "agg4_group_count",
    """SELECT l_orderkey, count(*) AS line_cnt FROM lineitem
      |GROUP BY l_orderkey""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem").groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("line_cnt"))
  }

  /** OP-AGG-5/6 — group-by routing + sum (per-token grouping, etl.rs:374-379;
    * logging sum etl.rs:144). Doubles are summed as DECIMAL for exact
    * cross-engine equality (order-independent), then the final 2-dp value
    * is rendered as DOUBLE on both sides: Spark widens sum(DECIMAL(18,2))
    * to DECIMAL(28,2) while DuckDB widens to DECIMAL(38,2), so a decimal
    * output type hash-mismatches even when every value is identical. */
  val agg56GroupSum: GraftQuery = q(
    "agg56_group_sum",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
      |    AS sum_qty,
      |  count(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) {
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity").cast("decimal(18,2)")), 2)
          .cast("double").as("sum_qty"),
          count(lit(1)).as("cnt"))
  }

  /** TPC-H Q1-shaped headline aggregate — partial+final hash agg with
    * decimal-exact sums and multiple measures. */
  val q1Agg: GraftQuery = q(
    "q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
      |    AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
      |    AS sum_base_price,
      |  min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) {
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity").cast("decimal(18,2)")), 2)
            .cast("double").as("sum_qty"),
          round(sum(col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double").as("sum_base_price"),
          min(col("l_shipdate")).as("min_ship"),
          max(col("l_shipdate")).as("max_ship"),
          count(lit(1)).as("count_order"))
  }

  /** count_distinct — declared surface (SURVEY §2.4). */
  val aggCountDistinct: GraftQuery = q(
    "agg_count_distinct",
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem").groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"))
  }

  /** approx_count_distinct (HLL) — sketch output is engine-specific, so the
    * oracle checks only exactness-independent semantics via rows-only. */
  val aggApproxDistinct: GraftQuery = GraftQuery(
    "agg_approx_distinct",
    (s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts")),
    None)

  /** ROLLUP grouping sets — declared surface (SURVEY §2.4). */
  val aggRollup: GraftQuery = q(
    "agg_rollup",
    """SELECT n.n_name, c.c_mktsegment, count(*) AS cnt
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY ROLLUP (n.n_name, c.c_mktsegment)""".stripMargin) { (s, dir) =>
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(n("n_name").as("n_name"), c("c_mktsegment").as("c_mktsegment"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** CUBE grouping sets — declared surface. */
  val aggCube: GraftQuery = q(
    "agg_cube",
    """SELECT l_returnflag, l_linestatus, count(*) AS cnt
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem").cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"))
  }

  // ---------------------------------------------------------------------
  // Sorts / limits (OP-SRT-*)
  // ---------------------------------------------------------------------

  /** OP-SRT-1 — ORDER BY ... DESC LIMIT 1 (latest block,
    * sqlite3.rs:156) — Catalyst plans TakeOrderedAndProject. */
  val srt1Top1: GraftQuery = q(
    "srt1_top1",
    "SELECT * FROM orders ORDER BY o_orderkey DESC LIMIT 1") { (s, dir) =>
    t(s, dir, "orders").orderBy(col("o_orderkey").desc).limit(1)
  }

  /** OP-SRT-2 + top-k — deterministic (unique-key tiebreak) top-10. */
  val srtTopK: GraftQuery = q(
    "srt_topk",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) {
    (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
  }

  // ---------------------------------------------------------------------
  // Set operations (OP-SET-*)
  // ---------------------------------------------------------------------

  /** OP-SET-1/2 — UNION ALL of per-partition branches with per-branch
    * predicates (per-token tables, sqlite3.rs:585-594, 622-635). With the
    * engine's single-table layout this is a filter union that Catalyst
    * pushes back down (PushProjectionThroughUnion). */
  val set1UnionAll: GraftQuery = q(
    "set1_union_all",
    """SELECT c_custkey, c_name FROM customer WHERE c_nationkey = 1
      |UNION ALL
      |SELECT c_custkey, c_name FROM customer WHERE c_nationkey = 2
      |UNION ALL
      |SELECT c_custkey, c_name FROM customer
      |  WHERE c_nationkey = 3 AND c_acctbal > 0""".stripMargin) { (s, dir) =>
    val c = t(s, dir, "customer")
    def branch(p: Column) = c.filter(p).select("c_custkey", "c_name")
    branch(col("c_nationkey") === 1)
      .unionAll(branch(col("c_nationkey") === 2))
      .unionAll(branch(col("c_nationkey") === 3 && col("c_acctbal") > 0))
  }

  /** INTERSECT — declared surface (distinct semantics match DuckDB). */
  val setIntersect: GraftQuery = q(
    "set_intersect",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin) {
    (s, dir) =>
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .intersect(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
  }

  /** EXCEPT — declared surface. */
  val setExcept: GraftQuery = q(
    "set_except",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin) {
    (s, dir) =>
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "O").select("o_custkey")
        .except(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
  }

  // ---------------------------------------------------------------------
  // Scalar functions (OP-FN-*)
  // ---------------------------------------------------------------------

  /** OP-FN-1 — fixed-offset substring slicing (calldata field extraction,
    * cbc20.rs:43-44). */
  val fn1Substring: GraftQuery = q(
    "fn1_substring",
    """SELECT p_partkey, substr(p_name, 1, 5) AS head,
      |       substr(p_type, 3, 4) AS mid
      |FROM part""".stripMargin) { (s, dir) =>
    t(s, dir, "part").select(col("p_partkey"),
      substring(col("p_name"), 1, 5).as("head"),
      substring(col("p_type"), 3, 4).as("mid"))
  }

  /** OP-FN-2 — prefix match (selector test cbc20.rs:27; LIKE table
    * discovery sqlite3.rs:183). */
  val fn2Prefix: GraftQuery = q(
    "fn2_prefix",
    """SELECT p_partkey, p_brand FROM part
      |WHERE p_brand LIKE 'Brand#1%'""".stripMargin) { (s, dir) =>
    t(s, dir, "part").filter(col("p_brand").startsWith("Brand#1"))
      .select("p_partkey", "p_brand")
  }

  /** OP-FN-3 — hex→integer parse (usize::from_str_radix, cbc20.rs:62).
    * Round-trips through hex so the oracle is exact: conv(hex(k)) == k. */
  val fn3HexParse: GraftQuery = q(
    "fn3_hex_parse",
    "SELECT o_orderkey, o_orderkey AS parsed FROM orders") { (s, dir) =>
    t(s, dir, "orders").select(col("o_orderkey"),
      conv(lower(hex(col("o_orderkey"))), 16, 10).cast("long").as("parsed"))
  }

  /** OP-FN-4 — unix seconds → formatted timestamp (sqlite3.rs:414).
    * Round-trips epoch extraction + re-format for an exact oracle. */
  val fn4TimestampFormat: GraftQuery = q(
    "fn4_ts_format",
    """SELECT event_id,
      |  strftime(to_timestamp(epoch(date_trunc('second', ts))),
      |           '%Y-%m-%d %H:%M:%S') AS created_at
      |FROM events""".stripMargin) { (s, dir) =>
    t(s, dir, "events").select(col("event_id"),
      date_format(
        to_timestamp(unix_timestamp(col("ts"))), "yyyy-MM-dd HH:mm:ss")
        .as("created_at"))
  }

  /** OP-FN-5 — retention cutoff: now()-interval in the reference
    * (sqlite3.rs:490-492); anchored to max(ts) here so the oracle is
    * deterministic. */
  val fn5IntervalCutoff: GraftQuery = q(
    "fn5_interval_cutoff",
    """SELECT event_id, user_id FROM events
      |WHERE CAST(ts AS TIMESTAMP) >
      |  (SELECT max(CAST(ts AS TIMESTAMP)) FROM events) - INTERVAL 7 DAY
      |""".stripMargin) { (s, dir) =>
    t(s, dir, "events").createOrReplaceTempView("graft_events_f5")
    s.sql("""SELECT event_id, user_id FROM graft_events_f5
            |WHERE ts > (SELECT max(ts) FROM graft_events_f5)
            |           - INTERVAL 7 DAY""".stripMargin)
  }

  /** OP-FN-7 — height arithmetic: ± literals and modulo cadence
    * (etl.rs:171,300,318). */
  val fn7Arithmetic: GraftQuery = q(
    "fn7_arithmetic",
    """SELECT o_orderkey, o_orderkey - 10 AS back10,
      |  (o_orderkey + 1) % 1000 AS cadence
      |FROM orders""".stripMargin) { (s, dir) =>
    t(s, dir, "orders").select(col("o_orderkey"),
      (col("o_orderkey") - 10).as("back10"),
      pmod(col("o_orderkey") + 1, lit(1000)).as("cadence"))
  }

  /** OP-FN-8 — conditional (receipt status mapping, etl.rs:371). */
  val fn8Conditional: GraftQuery = q(
    "fn8_conditional",
    """SELECT o_orderkey,
      |  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS done
      |FROM orders""".stripMargin) { (s, dir) =>
    t(s, dir, "orders").select(col("o_orderkey"),
      when(col("o_orderstatus") === "F", 1).otherwise(0).as("done"))
  }

  /** OP-FN-9 — string split / field extraction (watch-token "type:addr"
    * parsing, export.rs:108-111; regex field pull from props). */
  val fn9SplitExtract: GraftQuery = q(
    "fn9_split_extract",
    """SELECT event_id,
      |  regexp_extract(props, '"k": (\d+)', 1) AS k_val,
      |  split_part(event_type, 'i', 1) AS head
      |FROM events""".stripMargin) { (s, dir) =>
    t(s, dir, "events").select(col("event_id"),
      regexp_extract(col("props"), "\"k\": (\\d+)", 1).as("k_val"),
      split(col("event_type"), "i").getItem(0).as("head"))
  }

  // ---------------------------------------------------------------------
  // Window functions (OP-WIN-*)
  // ---------------------------------------------------------------------

  /** OP-WIN-1 — continuity gap detection via lag (verify.rs:48-59:
    * next.number == cur.number + 1). Runs over a keyspace with injected
    * gaps (every 7th key removed) so the check actually fires.
    *
    * Scale note: a global `Window.orderBy` is single-partition; the engine
    * uses it only on bounded verify slices. The scale path is
    * range-partitioned lag with boundary exchange (SURVEY §3.3). */
  val win1GapCheck: GraftQuery = q(
    "win1_gap_check",
    """SELECT o_orderkey, prev_key FROM (
      |  SELECT o_orderkey,
      |    lag(o_orderkey) OVER (ORDER BY o_orderkey) AS prev_key
      |  FROM orders WHERE o_orderkey % 7 <> 0) g
      |WHERE prev_key IS NOT NULL AND o_orderkey <> prev_key + 1
      |""".stripMargin) { (s, dir) =>
    val w = Window.orderBy(col("o_orderkey"))
    t(s, dir, "orders")
      .filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey"), lag(col("o_orderkey"), 1).over(w).as("prev_key"))
      .filter(col("prev_key").isNotNull && col("o_orderkey") =!= col("prev_key") + 1)
  }

  /** OP-WIN-2 — genesis-anchored identity check via row_number
    * (verify.rs:74-79: block[i].number == i). */
  val win2RowNumber: GraftQuery = q(
    "win2_row_number",
    """SELECT o_orderkey, rn FROM (
      |  SELECT o_orderkey,
      |    row_number() OVER (ORDER BY o_orderkey) AS rn
      |  FROM orders WHERE o_orderkey % 7 <> 0) t
      |WHERE o_orderkey <> rn - 1""".stripMargin) { (s, dir) =>
    val w = Window.orderBy(col("o_orderkey"))
    t(s, dir, "orders")
      .filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey"), row_number().over(w).as("rn"))
      .filter(col("o_orderkey") =!= col("rn") - 1)
  }

  /** Scale path of [[win1GapCheck]] as a driver-oracled query: the exact
    * `ChainOps.continuityGapsScalable` decomposition (per-bucket lag +
    * one-row-per-bucket boundary exchange) run over the same verify slice,
    * against the same oracle SQL — the hash gate proves the scalable form
    * result-identical to the global-window demo, not just spec-equal. */
  val win1GapCheckScalable: GraftQuery = q(
    "win1_gap_check_scalable",
    win1GapCheck.oracle.get) { (s, dir) =>
    val keys = t(s, dir, "orders")
      .filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey").as("number"))
    graft.chain.ChainOps.continuityGapsScalable(keys,
      ExtendedOps.cachedSpanBucketSize(dir, "orders:gaps", "number")(keys))
      .select(col("number").as("o_orderkey"),
        col("prev_number").as("prev_key"))
  }

  /** Scale path of [[win2RowNumber]] as a driver-oracled query — the
    * `ChainOps.identityMismatchesScalable` decomposition (per-bucket
    * row_number + broadcast cumulative offsets; the only global window
    * sees one row per bucket). Same oracle SQL as the global form. */
  val win2RowNumberScalable: GraftQuery = q(
    "win2_row_number_scalable",
    win2RowNumber.oracle.get) { (s, dir) =>
    val keys = t(s, dir, "orders")
      .filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey").as("number"))
    graft.chain.ChainOps.identityMismatchesScalable(keys,
      ExtendedOps.cachedSpanBucketSize(dir, "orders:gaps", "number")(keys))
      .select(col("number").as("o_orderkey"),
        (col("expected") + 1).cast("long").as("rn"))
  }

  /** Analytic frame — running sum per partition with deterministic
    * tiebreak ordering (declared surface, SURVEY §2.8). */
  val win3RunningSum: GraftQuery = q(
    "win3_running_sum",
    """SELECT o_custkey, o_orderkey,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
      |    AS DOUBLE) AS running
      |FROM orders""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"),
      round(sum(col("o_totalprice").cast("decimal(18,2)")).over(w), 2)
        .cast("double").as("running"))
  }

  /** Ranking — rank/dense_rank per group (declared surface). */
  val win4Rank: GraftQuery = q(
    "win4_rank",
    """SELECT l_orderkey, l_linenumber,
      |  rank() OVER (PARTITION BY l_orderkey
      |               ORDER BY l_extendedprice DESC, l_linenumber) AS rnk,
      |  dense_rank() OVER (PARTITION BY l_orderkey
      |               ORDER BY l_returnflag) AS drnk
      |FROM lineitem""".stripMargin) { (s, dir) =>
    val byPrice = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
    val byFlag = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_returnflag"))
    t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
      rank().over(byPrice).as("rnk"), dense_rank().over(byFlag).as("drnk"))
  }

  val all: Seq[GraftQuery] = Seq(
    fil1AddressFilter, fil2PointLookup, fil3EqualityScan, fil4Range,
    fil4RangeOpen, fil5Conjunctive, fil6Disjunctive, fil7Distinct,
    fil8Selector,
    prj1Narrow, prj3Derived, prj4Sentinel, prj5Hex,
    join1Enrich, join2Status, joinSemi, joinAnti, joinTheta, joinFullOuter,
    agg1Max, agg2CoalescedMax, agg3ScalarSubquery, agg4Count, agg56GroupSum,
    q1Agg, aggCountDistinct, aggApproxDistinct, aggRollup, aggCube,
    srt1Top1, srtTopK,
    set1UnionAll, setIntersect, setExcept,
    fn1Substring, fn2Prefix, fn3HexParse, fn4TimestampFormat,
    fn5IntervalCutoff, fn7Arithmetic, fn8Conditional, fn9SplitExtract,
    win1GapCheck, win1GapCheckScalable, win2RowNumber,
    win2RowNumberScalable, win3RunningSum, win4Rank)
}
