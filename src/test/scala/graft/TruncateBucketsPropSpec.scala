package graft

import graft.operators.DedupOps
import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for [[DedupOps.truncateBuckets]], complementing
  * TruncateBucketsSpec's hand-written shape pins. The policy is the
  * liveness contract every at-rest perceptual/band index now rides on
  * (stage, build, AND compact time), so beyond the named shapes it is
  * worth checking the full contract on arbitrary inputs: the Spark
  * operator must equal a plain-Scala reference implementation of
  * "rank within bucket by the order columns; keep rank <= cap, plus
  * every unit's single best-ranked row" — which bundles subset-ness,
  * per-unit liveness, cap-respect-modulo-liveness, and determinism
  * into one exact-equality property. Inputs are generated with a
  * unique (bucket, unit) per row — exactly the production shape
  * (a unit contributes at most one row per band bucket: phash/afp/
  * vhash band rows are one per (unit, band), text band rows one per
  * (doc, band)) — so the rank order is total and the reference is
  * well-defined. */
class TruncateBucketsPropSpec extends AnyFunSuite with BeforeAndAfterAll
    with TempDirCleanup {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  // (band, band_key, asset_id, chunk_idx, hash) — multi-unit shape;
  // the single-unit kinds are the chunk_idx==constant degenerate case,
  // which the generator also produces (nChunks can draw 1).
  private case class R(band: Int, key: Long, asset: Long, chunk: Int,
      hash: Long)

  private val genRows: Gen[List[R]] = for {
    nAssets <- Gen.choose(1, 18)
    nChunks <- Gen.choose(1, 3)
    nBands <- Gen.choose(1, 3)
    nKeys <- Gen.choose(1, 4)
    // each (band, key, asset, chunk) appears at most once: pick a
    // random subset of the full cross product
    rows <- Gen.sequence[List[Option[R]], Option[R]](
      (for {
        b <- 0 until nBands; k <- 0L until nKeys.toLong
        a <- 0L until nAssets.toLong; c <- 0 until nChunks
      } yield Gen.option(Gen.choose(Long.MinValue, Long.MaxValue)
        .map(h => R(b, k, a, c, h)))).toList)
  } yield rows.flatten

  /** The contract, in plain Scala: rank rows inside each (band, key)
    * bucket by (asset, chunk); keep rank <= cap plus each
    * (asset, chunk) unit's minimum-rank row. */
  private def reference(rows: List[R], cap: Int): Set[R] = {
    val ranked = rows.groupBy(r => (r.band, r.key)).toList.flatMap {
      case (_, g) =>
        g.sortBy(r => (r.asset, r.chunk)).zipWithIndex
          .map { case (r, i) => (r, i + 1) }
    }
    val best = ranked.groupBy { case (r, _) => (r.asset, r.chunk) }
      .map { case (u, g) => u -> g.map(_._2).min }
    ranked.collect {
      case (r, rn) if rn <= cap || rn == best((r.asset, r.chunk)) => r
    }.toSet
  }

  test("truncateBuckets == the reference ranking on arbitrary inputs " +
      "(subset + per-unit liveness + cap-modulo-liveness + " +
      "determinism, as one exact equality)") {
    import spark.implicits._
    val prop = Prop.forAll(genRows, Gen.choose(1, 7)) { (rows, cap) =>
      rows.isEmpty || {
        val df = rows.map(r => (r.band, r.key, r.asset, r.chunk, r.hash))
          .toDF("band", "band_key", "asset_id", "chunk_idx", "hash")
        val got = DedupOps.truncateBuckets(df, Seq("band", "band_key"),
          cap.toLong, Seq("asset_id", "chunk_idx"),
          Seq("asset_id", "chunk_idx"))
          .collect()
          .map(r => R(r.getInt(0), r.getLong(1), r.getLong(2),
            r.getInt(3), r.getLong(4))).toSet
        got == reference(rows, cap)
      }
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(r.passed, r.status.toString)
  }
}
