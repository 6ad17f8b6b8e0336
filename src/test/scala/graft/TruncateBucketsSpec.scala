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
      Cap, "asset_id", Seq("asset_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val hot = kept.filter(_._2 == 0)
    assert(hot.size == Cap, s"hot bucket must hold exactly $Cap: ${hot.size}")
    assert(hot.map(_._1).sorted == (0L until Cap.toLong),
      "truncation must keep the FIRST cap assets in order")
    // liveness: all 100 assets retain >= 1 row (the private one ranks 1)
    assert(kept.map(_._1).distinct.size == 100)
    // determinism: a second evaluation yields the identical set
    val again = DedupOps.truncateBuckets(rows, Seq("band", "band_key"),
      Cap, "asset_id", Seq("asset_id"))
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
      Cap, "asset_id", Seq("asset_id")).count()
    assert(kept == 100L, s"liveness must keep all single-row assets: $kept")
  }

  test("under-cap groups pass through untouched") {
    import spark.implicits._
    val rows = (0 until 50).map(a => (a.toLong, 0, a.toLong % 4, 1L))
      .toDF("asset_id", "band", "band_key", "hash")
    assert(DedupOps.truncateBuckets(rows, Seq("band", "band_key"),
      Cap, "asset_id", Seq("asset_id")).count() == 50L)
  }

  test("a multi-unit asset (chunked afp shape) keeps per-unit rows " +
      "under the cap and at least its best row past it") {
    import spark.implicits._
    // 70 assets x 2 chunks, all rows in ONE bucket; order by
    // (asset_id, chunk_idx) ranks asset a's chunks at 2a+1, 2a+2
    val rows = (0 until 70).flatMap(a => Seq(
      (a.toLong, 0, 0, 0L, 1L), (a.toLong, 1, 0, 0L, 2L)))
      .toDF("asset_id", "chunk_idx", "band", "band_key", "hash")
    val kept = DedupOps.truncateBuckets(rows, Seq("band", "band_key"),
      Cap, "asset_id", Seq("asset_id", "chunk_idx"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    // first 32 assets keep both chunks (ranks <= 64); later assets
    // keep their best (chunk 0) row only
    assert(kept.count(_._1 < 32L) == 64, s"$kept")
    (32 until 70).foreach { a =>
      val mine = kept.filter(_._1 == a.toLong)
      assert(mine.toSeq == Seq((a.toLong, 0)),
        s"asset $a must keep exactly its best (chunk 0) row: $mine")
    }
  }
}
