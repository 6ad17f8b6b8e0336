package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators — the two join shapes Spark has no native
  * operator for and a chain/event warehouse needs constantly: as-of
  * ("most recent fact at or before this time") and banded range joins.
  * Both are built by re-expressing the non-equi condition as an equi
  * shuffle Catalyst can plan well, never by nested-loop scanning.
  *
  * As-of (cf. the reference's height-anchored lookups,
  * crates/storage/sqlite3/src/sqlite3.rs "WHERE block_number <= ?"
  * point queries): the classic union-and-window formulation — tag both
  * inputs, union them, sort within each key by (time, side) and carry the
  * build side's last row forward with an unbounded-preceding window.
  * Cost: ONE shuffle on the join key, a per-key sort, zero row
  * amplification. The alternatives all fail at 100 TB: a range
  * theta-join explodes to O(events x orders-per-key) before filtering,
  * and per-key `collect_list` re-buffers whole keys in memory. Skew
  * follows key cardinality, so the salting utilities (SkewOps) compose
  * if one user dominates.
  *
  * Banded range join: when the non-equi predicate is a bounded band
  * (|a - b| <= w), quantizing both sides to w-sized buckets turns it
  * into an equi-join — the probe side maps to ONE bucket, the build side
  * to the <= 3 buckets its band overlaps, and the exact predicate
  * re-filters inside the bucket. Same results as the
  * BroadcastNestedLoopJoin form (`join_theta`), but shuffle-partitioned:
  * it survives when BOTH sides are fact-sized, where BNLJ needs one side
  * to fit in a broadcast.
  */
object TemporalOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.t(s, dir, name)

  /** Generic as-of join: for every left row, attach the right row with
    * the greatest `rightTs <= leftTs` within the same `key` (inclusive).
    * `right` must be unique per (key, ts) — pre-aggregate ties before
    * calling (the ties are WITHIN the right side; resolving them is the
    * caller's business rule, not the join's).
    *
    * Right rows sort BEFORE left rows at equal timestamps (side 0 vs 1),
    * which is exactly the inclusive "at or before" semantics. */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String): DataFrame = {
    val payloadCols = right.columns.filter(c => c != rightKey && c != rightTs)
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__k", col(leftKey))
      .withColumn("__ts", col(leftTs))
    val r = right
      .select(col(rightKey).as("__k") +: col(rightTs).as("__ts") +:
        payloadCols.map(col): _*)
      .withColumn("__side", lit(0))
    // align schemas: left gets null payload columns, right gets null left
    // columns; unionByName fills the gaps
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }.withColumn("__r_ts", last(when(col("__side") === 0, col("__ts")),
      ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .drop("__side", "__k", "__ts")
  }

  /** As-of join of the event stream to each user's most recent order at
    * or before the event: the "state of the account when the event
    * happened" enrichment. Ties among a user's same-day orders resolve
    * to the max order key BEFORE the join (business rule: latest id
    * wins), keeping the as-of input unique per (key, ts). */
  val joinAsof: GraftQuery = GraftQuery(
    "join_asof",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"))
      val ord = t(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("ord_key"))
      asofJoin(ev, ord, "user_id", "o_custkey", "ts", "o_orderdate")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("ord_key"), col("__r_ts").as("ord_ts"))
    },
    // DuckDB has a native ASOF JOIN — the perfect oracle: same inclusive
    // greatest-at-or-before semantics, independently implemented.
    Some(
      """WITH o1 AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS ord_key
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts, o1.ord_key,
        |  o1.o_orderdate AS ord_ts
        |FROM events e ASOF LEFT JOIN o1
        |  ON e.user_id = o1.o_custkey AND e.ts >= o1.o_orderdate"""
        .stripMargin))

  /** Banded range join via bucket quantization — identical semantics to
    * `join_theta` (|c_acctbal - s_acctbal| <= 10) but planned as an
    * equi-join: customer maps to one floor(bal/w) bucket, supplier
    * explodes to the <= 3 buckets its +-10 band overlaps (w = 10), the
    * join runs on the bucket key, and the exact band predicate refines
    * in-bucket. Each qualifying pair meets in exactly the customer's
    * bucket, so no dedup is needed. */
  val joinRangeBucketed: GraftQuery = GraftQuery(
    "join_range_bucketed",
    (s, dir) => {
      val w = 10.0
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_acctbal"))
        .withColumn("bucket", explode(sequence(
          floor((col("s_acctbal") - w) / w).cast("long"),
          floor((col("s_acctbal") + w) / w).cast("long"))))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"))
        .withColumn("bucket", floor(col("c_acctbal") / w).cast("long"))
      sup.join(cust, Seq("bucket"))
        .filter(col("c_acctbal") >= col("s_acctbal") - w &&
          col("c_acctbal") <= col("s_acctbal") + w)
        .select(col("s_suppkey"), col("c_custkey"))
    },
    Some(
      """SELECT s.s_suppkey, c.c_custkey FROM supplier s
        |JOIN customer c
        |  ON c.c_acctbal >= s.s_acctbal - 10 AND c.c_acctbal <= s.s_acctbal + 10
        |""".stripMargin))

  val all: Seq[GraftQuery] = Seq(joinAsof, joinRangeBucketed)
}
