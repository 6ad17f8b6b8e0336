package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §4: "salting for skew").
  *
  * AQE's skew-join split handles most runtime skew; these are the
  * plan-level tools for the cases AQE cannot fix:
  *
  *  - [[saltedAggregate]]: a hot grouping key overwhelms one reducer →
  *    two-phase aggregation through a random salt. Correct for
  *    decomposable aggregates (sum/count/min/max).
  *  - [[saltedJoin]]: a hot join key on the big side → replicate the
  *    small side per salt, spread the big side across salts. Inner/left
  *    equi-join results are identical to the unsalted join (other join
  *    types are rejected — see the method doc).
  *
  * Salt uses a deterministic hash of a tiebreak column rather than
  * rand() so results stay reproducible (and replay-safe in streaming).
  */
object SkewOps {

  /** Two-phase salted aggregation: groupBy(key, salt) partial sums, then
    * groupBy(key) final merge. */
  def saltedAggregate(
      df: DataFrame,
      key: Column,
      tiebreak: Column,
      salts: Int,
      agg: (String, Column)*): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(tiebreak), lit(salts)))
    val partials = salted.groupBy(key.as("__key"), col("__salt"))
      .agg(agg.head._2.as(agg.head._1),
        agg.tail.map { case (n, c) => c.as(n) }: _*)
    // merge phase: sums/counts re-sum, min/max re-min/max — caller passes
    // the merge expression per column name
    partials
  }

  /** Salted sum: the common decomposable case end-to-end. Output schema:
    * (key, total). */
  def saltedSum(
      df: DataFrame,
      key: Column,
      value: Column,
      tiebreak: Column,
      salts: Int = 16): DataFrame =
    saltedAggregate(df, key, tiebreak, salts, "partial" -> sum(value))
      .groupBy(col("__key").as("key"))
      .agg(sum(col("partial")).as("total"))

  /** Skew-safe equi-join: big side gets a deterministic salt in
    * [0, salts); small side is replicated across every salt value, so the
    * hot key's rows spread over `salts` tasks instead of one.
    *
    * Restricted to inner/left joins: those are exactly equivalent to the
    * unsalted join (each big row carries one salt, so unmatched big rows
    * surface once). right/full_outer would emit every unmatched SMALL row
    * `salts` times — one per unmatched replica — so they are rejected. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: Column,
      smallKey: Column,
      bigTiebreak: Column,
      salts: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "left_outer", "leftouter")
        .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left_outer only, got '$joinType' — " +
        "unmatched small-side rows would be duplicated per salt")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(bigTiebreak), lit(salts)))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedBig.join(replicatedSmall,
        bigKey === smallKey && saltedBig("__salt") === replicatedSmall("__salt"),
        joinType)
      .drop("__salt")
  }

  // ---------------------------------------------------------------------
  // Driver-visible oracled queries: the salted plans against the UNSALTED
  // SQL — results must be identical by construction, so a full DuckDB
  // rows+schema+hash gate proves the 100 TB skew machinery is semantics-
  // preserving (PlanSpec separately asserts the salt actually fans the
  // hot key across tasks).
  // ---------------------------------------------------------------------

  /** Synthetic hot key: every 4th lineitem row collapses onto sentinel
    * key -1 — ~25% of the table on ONE reducer if aggregated naively. */
  private def hotAggKey: Column =
    when(col("l_orderkey") % 4 === 0, lit(-1L)).otherwise(col("l_suppkey"))

  /** Salted two-phase sum over the hot-keyed lineitem. Decimal-exact
    * partials (order-independent), so salted == unsalted to the bit. */
  val saltedAggQuery: GraftQuery = GraftQuery(
    "skew_salted_agg",
    (s, dir) =>
      saltedSum(Tables.t(s, dir, "lineitem"), hotAggKey,
          col("l_quantity").cast("decimal(18,2)"), col("l_orderkey"), 16)
        .select(col("key"),
          round(col("total"), 2).cast("double").as("total")),
    Some(
      """SELECT CASE WHEN l_orderkey % 4 = 0 THEN -1 ELSE l_suppkey END
        |    AS key,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
        |    AS total
        |FROM lineitem GROUP BY 1""".stripMargin))

  /** Salted equi-join of hot-keyed lineitem (25% of rows directed at
    * part 1) against the part dimension, aggregated per brand. The small
    * side replicates across 16 salts; the oracle is the plain join. */
  val saltedJoinQuery: GraftQuery = GraftQuery(
    "skew_salted_join",
    (s, dir) => {
      val li = Tables.t(s, dir, "lineitem")
        .withColumn("jk",
          when(col("l_orderkey") % 4 === 0, lit(1L))
            .otherwise(col("l_partkey")))
      val p = Tables.t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))
      saltedJoin(li, p, col("jk"), col("p_partkey"), col("l_orderkey"), 16)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity").cast("decimal(18,2)")), 2)
            .cast("double").as("sum_qty"))
    },
    Some(
      """SELECT p_brand, count(*) AS n,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
        |    AS sum_qty
        |FROM lineitem JOIN part
        |  ON p_partkey =
        |    (CASE WHEN l_orderkey % 4 = 0 THEN 1 ELSE l_partkey END)
        |GROUP BY 1""".stripMargin))

  val all: Seq[GraftQuery] = Seq(saltedAggQuery, saltedJoinQuery)
}
