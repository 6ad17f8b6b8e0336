package graft

import graft.operators.RelationalOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Quantitative gate for `agg_approx_distinct` — the last rows-only
  * driver query without an error contract (Misra-Gries got its bound in
  * TopKSpec). "HLL is approximate" is not a correctness statement; this
  * spec turns it into one:
  *
  *   - error bound on the driver corpus: per group,
  *     |approx − exact| ≤ 3·rsd·exact, with rsd = Spark's default
  *     relativeSD (0.05). The HLL++ standard error is rsd·exact, so 3σ
  *     is a generous-but-meaningful envelope; everything is
  *     deterministic (fixed hash over fixed data), so the gate is a pin,
  *     not a flake.
  *   - exactness at small cardinality: HLL++ answers through linear
  *     counting when the register set is sparse, which resolves exactly
  *     for n ≪ m = 2^p registers. Probabilistic in theory, deterministic
  *     in practice (fixed xxhash over fixed values) — pinned so a
  *     regression in the small-n regime (where users most notice a
  *     wrong count) is loud.
  *   - the rsd dial: a tighter requested rsd must not widen the driver
  *     corpus's actual error.
  */
class ApproxDistinctSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"
  private val Rsd = 0.05 // Spark's approx_count_distinct default

  test("driver corpus: per-group |approx - exact| <= 3*rsd*exact") {
    val approx = RelationalOps.aggApproxDistinct.fn(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet, "group sets must agree")
    exact.foreach { case (g, ex) =>
      val ap = approx(g)
      val tol = 3.0 * Rsd * ex
      assert(math.abs(ap - ex) <= tol,
        s"group $g: approx=$ap exact=$ex exceeds 3*rsd bound (±$tol)")
    }
  }

  test("small cardinality resolves exactly when registers >> n") {
    import spark.implicits._
    // Exactness holds in HLL++'s linear-counting regime, which needs the
    // register count m = (1.04/rsd)² to dwarf n: measured here, default
    // rsd=0.05 (m=512) returns 103 for n=100 — so the exactness contract
    // is pinned at the rsd that provides the registers (0.01 → m=16384),
    // plus the n ≪ m slice of the default. Values are replicated across
    // partitions so the partial/merge paths run.
    def got(n: Int, rsd: Double): Long =
      (0 until n).flatMap(i => Seq.fill(7)(i.toLong))
        .toDF("v").repartition(4)
        .agg(approx_count_distinct(col("v"), rsd).as("a"))
        .head.getLong(0)
    // measured boundary: n=1000 at m=16384 already loses 4 to register
    // collisions (996), so "small" means n ≲ m/100 — pinned below it
    Seq(1, 10).foreach(n =>
      assert(got(n, 0.05) == n.toLong, s"default-rsd small-n: n=$n"))
    Seq(1, 10, 100).foreach(n =>
      assert(got(n, 0.01) == n.toLong, s"rsd=0.01 small-n: n=$n"))
  }

  test("tighter requested rsd does not widen the driver-corpus error") {
    val exact = Tables.t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def errAt(rsd: Double): Double =
      Tables.t(spark, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), rsd).as("a"))
        .collect().map { r =>
          val ex = exact(r.getString(0))
          math.abs(r.getLong(1) - ex).toDouble / ex
        }.max
    val loose = errAt(0.05)
    val tight = errAt(0.01)
    // the tight estimator gets 25x the registers; its worst group must
    // sit inside ITS OWN 3-sigma envelope, and not above the loose one's
    assert(tight <= 3.0 * 0.01, s"rsd=0.01 worst rel-error $tight")
    assert(loose <= 3.0 * 0.05, s"rsd=0.05 worst rel-error $loose")
  }
}
