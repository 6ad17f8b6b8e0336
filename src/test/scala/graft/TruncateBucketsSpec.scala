package graft

import graft.operators.DedupOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the EXACT semantics of the at-rest perceptual truncation
  * policy ([[DedupOps.truncateBuckets]]) — the streaming gates'
  * replay-liveness contract rides on it, so its two shapes are worth
  * their own gates: asymmetric skew truncates to the cap while every
  * asset keeps its best row elsewhere; the degenerate all-past-cap
  * single-row case keeps everything (liveness beats the cap). */
class TruncateBucketsSpec extends AnyFunSuite with BeforeAndAfterAll
    with TempDirCleanup {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  private val Cap = DedupOps.MaxBucketSize // 64

  test("asymmetric skew: the hot bucket truncates to EXACTLY the cap " +
      "(first rows in deterministic order), every asset keeps its row " +
      "in its private bucket — nothing loses liveness") {
    import spark.implicits._
    // 100 assets: one row each in ONE hot (band=0, key=0) bucket plus
    // one row each in a private (band=1, key=asset) bucket
    val rows = (0 until 100).flatMap(a => Seq(
      (a.toLong, 0, 0L, a.toLong * 10), // hot
      (a.toLong, 1, 100L + a, a.toLong * 10))) // private
      .toDF("asset_id", "band", "band_key", "hash")
    val kept = DedupOps.truncateBuckets(rows, Seq("band", "band_key"),
      Cap, Seq("asset_id"), Seq("asset_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val hot = kept.filter(_._2 == 0)
    assert(hot.size == Cap, s"hot bucket must hold exactly $Cap: ${hot.size}")
    assert(hot.map(_._1).sorted == (0L until Cap.toLong),
      "truncation must keep the FIRST cap assets in order")
    // liveness: all 100 assets retain >= 1 row (the private one ranks 1)
    assert(kept.map(_._1).distinct.size == 100)
    // determinism: a second evaluation yields the identical set
    val again = DedupOps.truncateBuckets(rows, Seq("band", "band_key"),
      Cap, Seq("asset_id"), Seq("asset_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(again.sorted == kept.sorted)
  }

  test("all-past-cap single-row assets: liveness beats the cap — " +
      "every asset keeps its only row (they are each other's honest " +
      "matches; dropping any would break replay self-match)") {
    import spark.implicits._
    val rows = (0 until 100).map(a => (a.toLong, 0, 0L, 7L))
      .toDF("asset_id", "band", "band_key", "hash")
    val kept = DedupOps.truncateBuckets(rows, Seq("band", "band_key"),
      Cap, Seq("asset_id"), Seq("asset_id")).count()
    assert(kept == 100L, s"liveness must keep all single-row assets: $kept")
  }

  test("under-cap groups pass through untouched") {
    import spark.implicits._
    val rows = (0 until 50).map(a => (a.toLong, 0, a.toLong % 4, 1L))
      .toDF("asset_id", "band", "band_key", "hash")
    assert(DedupOps.truncateBuckets(rows, Seq("band", "band_key"),
      Cap, Seq("asset_id"), Seq("asset_id")).count() == 50L)
  }

  test("multi-unit liveness key (chunked afp shape): a hot bucket " +
      "truncates to the cap, but EVERY (asset, chunk) unit keeps its " +
      "best row elsewhere — per-unit keys, not per-asset") {
    import spark.implicits._
    // 70 assets x 2 chunks; each unit has a row in the ONE hot bucket
    // (band 0, key 0) and a row in a private bucket (band 1, unique key)
    val rows = (0 until 70).flatMap { a =>
      Seq(0, 1).flatMap(c => Seq(
        (a.toLong, c, 0, 0L, 10L * a + c), // hot
        (a.toLong, c, 1, 1000L + 2 * a + c, 10L * a + c))) // private
    }.toDF("asset_id", "chunk_idx", "band", "band_key", "hash")
    val kept = DedupOps.truncateBuckets(rows, Seq("band", "band_key"),
      Cap, Seq("asset_id", "chunk_idx"), Seq("asset_id", "chunk_idx"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val hot = kept.filter(_._3 == 0)
    assert(hot.length == Cap,
      s"hot bucket must truncate to exactly $Cap: ${hot.length}")
    // liveness at UNIT granularity: all 140 units retain >= 1 row
    assert(kept.map(t => (t._1, t._2)).distinct.length == 140)
  }

  test("the r16 per-asset regression case: a minority chunk whose ONLY " +
      "row sits past the cap in a hot bucket keeps it under per-unit " +
      "keys (a per-asset key would drop it and break the replay " +
      "self-match's majority-coverage verdict for 2-chunk clips)") {
    import spark.implicits._
    // chunk-0 rows in private buckets; ALL 70 chunk-1 rows in one hot
    // bucket, ranked 1..70 by asset_id — ranks 65..70 are past the cap
    // but each is its unit's only (hence best) row
    val rows = (0 until 70).flatMap(a => Seq(
      (a.toLong, 0, 1, 1000L + a, 1L), // private
      (a.toLong, 1, 0, 0L, 2L))) // hot
      .toDF("asset_id", "chunk_idx", "band", "band_key", "hash")
    val kept = DedupOps.truncateBuckets(rows, Seq("band", "band_key"),
      Cap, Seq("asset_id", "chunk_idx"), Seq("asset_id", "chunk_idx"))
    assert(kept.count() == 140L,
      "every chunk-1 row is its unit's best and must survive the cap")
  }
}
