package graft

import graft.operators.{RelationalOps, TemporalOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Semantics checks for the temporal joins: as-of picks the greatest
  * at-or-before match (inclusive, null when none), and the bucketed
  * range join is result-identical to the nested-loop theta form. */
class TemporalOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("asofJoin picks the greatest at-or-before row, inclusive, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // after both right rows for key 1 -> ts 8
      (2L, 5L, 101L),  // exactly equal to a right ts -> inclusive match
      (3L, 4L, 102L),  // before key 1's rows but key 3 has none -> null
      (1L, 7L, 103L)   // between 3 and 8 -> ts 3
    ).toDF("k", "ts", "ev")
    val right = Seq(
      (1L, 3L, 900L),
      (1L, 8L, 901L),
      (2L, 5L, 902L),
      (2L, 9L, 903L)   // after the key-2 event -> never matched
    ).toDF("k", "rts", "payload")
    val got = TemporalOps
      .asofJoin(left, right, "k", "k", "ts", "rts")
      .select(col("ev"), col("payload"), col("__r_ts"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toSet
    assert(got == Set(
      (100L, Some(901L), Some(8L)),
      (101L, Some(902L), Some(5L)),
      (102L, None, None),
      (103L, Some(900L), Some(3L))))
  }

  test("randomized sweep: asofJoin equals a brute-force greatest-at-or-" +
      "before join on adversarial key/ts collisions") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xa50f)
    for (trial <- 1 to 5) {
      // dense key/ts ranges force the adversarial shapes: left ts exactly
      // equal to a right ts (inclusive match), keys with no right rows,
      // many left rows sharing one key, right rows after every left ts
      val left = (1 to 40 + rnd.nextInt(60)).map(i =>
        (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(20).toLong))
        .toDF("id", "k", "ts")
      val right = (1 to 30 + rnd.nextInt(40)).map(_ =>
        (rnd.nextInt(6).toLong, rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
        .toDF("k", "rts", "payload")
        // the operator's contract: right unique per (key, ts)
        .groupBy("k", "rts").agg(max("payload").as("payload"))
      val got = TemporalOps.asofJoin(left, right, "k", "k", "ts", "rts")
        .select(col("id"), col("payload"), col("__r_ts"))
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .toSet
      // brute force: join every at-or-before candidate, keep the greatest
      val expected = left.as("l")
        .join(right.as("r"),
          col("l.k") === col("r.k") && col("r.rts") <= col("l.ts"), "left")
        .groupBy(col("l.id"))
        .agg(max_by(col("r.payload"), col("r.rts")).as("payload"),
          max(col("r.rts")).as("rts"))
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .toSet
      assert(got == expected, s"asof sweep trial $trial diverged")
    }
  }

  test("join_asof rows cover every event exactly once") {
    val out = TemporalOps.joinAsof.fn(spark, dir)
    val events = Tables.t(spark, dir, "events")
    assert(out.count() == events.count())
    assert(out.select("event_id").distinct().count() == events.count())
    // matched rows carry ord_ts <= ts
    assert(out.filter(col("ord_key").isNotNull &&
      col("ord_ts") > col("ts")).count() == 0)
  }

  test("bucketed range join equals the nested-loop theta join") {
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("s_suppkey"), r.getAs[Long]("c_custkey")))
      .toSet
    val theta = asSet(RelationalOps.joinTheta.fn(spark, dir))
    val bucketed = asSet(TemporalOps.joinRangeBucketed.fn(spark, dir))
    assert(bucketed == theta)
    assert(bucketed.nonEmpty)
  }
}
