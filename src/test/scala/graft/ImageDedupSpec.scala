package graft

import graft.operators.ImageDedupOps
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Image perceptual-hash near-dup: planted-copy recall, non-dup
  * separation, and exact banded-join/brute-force equivalence. */
class ImageDedupSpec extends AnyFunSuite with BeforeAndAfterAll
    with TempDirCleanup {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  private lazy val hashes =
    ImageDedupOps.imageAssets(ImageDedupOps.NumImages)
      .map(ImageDedupOps.hashAsset)
  private def hashOf(id: Long): Long =
    hashes.find(_.asset_id == id).get.phash
  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("planted near-dup transforms stay within the Hamming budget: " +
      "re-encode and brightness exactly 0, 90% resize <= MaxHamming") {
    for (i <- 0 until ImageDedupOps.DupSeeds) {
      val base = hashOf(i.toLong)
      assert(ham(base, hashOf(i + 1000L)) == 0,
        s"seed $i: lossless recompression changed the hash")
      assert(ham(base, hashOf(i + 2000L)) == 0,
        s"seed $i: +4 brightness changed the hash (shift-invariance " +
          "argument violated)")
      val dResize = ham(base, hashOf(i + 3000L))
      assert(dResize <= ImageDedupOps.MaxHamming,
        s"seed $i: 90% resize landed at Hamming $dResize > " +
          s"${ImageDedupOps.MaxHamming}")
    }
  }

  test("distinct base images are separated beyond the threshold") {
    val base = (0 until ImageDedupOps.NumImages).map(i => hashOf(i.toLong))
    val dists = for {
      a <- base.indices; b <- base.indices if a < b
    } yield ham(base(a), base(b))
    // measured min = 11 vs MaxHamming = 6: no false positive possible,
    // with margin against fixture drift (the +4 headroom)
    assert(dists.min > ImageDedupOps.MaxHamming + 4,
      s"closest non-dup base pair at Hamming ${dists.min} — too close " +
        s"to the ${ImageDedupOps.MaxHamming} threshold")
  }

  test("recompressed variant is a genuinely different container " +
      "(bytes differ), not a byte copy") {
    val assets = ImageDedupOps.imageAssets(ImageDedupOps.NumImages)
    def payload(id: Long) = assets.find(_.asset_id == id).get.payload
    for (i <- 0 until ImageDedupOps.DupSeeds)
      assert(!java.util.Arrays.equals(payload(i.toLong), payload(i + 1000L)),
        s"seed $i: re-encode produced identical bytes — the d=0 claim " +
          "would be vacuous")
  }

  test("banded pipeline matches the declared band-OR semantics, is " +
      "provably complete at d <= bands-1, and surfaces every planted " +
      "pair") {
    def bandKey(h: Long, k: Int): Long =
      (h >>> ((ImageDedupOps.NumBands - 1 - k) * 16)) & 65535L
    def shareBand(a: Long, b: Long): Boolean =
      (0 until ImageDedupOps.NumBands).exists(k => bandKey(a, k) == bandKey(b, k))
    val got = ImageDedupOps.phashNearDupPairs(
      ImageDedupOps.imageHashes(spark, ImageDedupOps.NumImages))
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming")))
      .toSet
    // declared semantics: band-OR candidates + Hamming verify
    val declared = (for {
      a <- hashes; b <- hashes if a.asset_id < b.asset_id
      d = ham(a.phash, b.phash)
      if d <= ImageDedupOps.MaxHamming && shareBand(a.phash, b.phash)
    } yield (a.asset_id, b.asset_id, d)).toSet
    assert(got == declared,
      s"banded=${got.size} declared=${declared.size}; " +
        s"missing=${(declared -- got).take(5)} " +
        s"extra=${(got -- declared).take(5)}")
    // pigeonhole zone: every brute-force pair at d <= NumBands-1 MUST
    // be in the result (3 flips cannot touch all 4 bands)
    val pigeonZone = (for {
      a <- hashes; b <- hashes if a.asset_id < b.asset_id
      d = ham(a.phash, b.phash) if d <= ImageDedupOps.NumBands - 1
    } yield (a.asset_id, b.asset_id, d)).toSet
    assert(pigeonZone.subsetOf(got),
      s"pigeonhole violation: ${(pigeonZone -- got).take(5)}")
    for (i <- 0 until ImageDedupOps.DupSeeds) {
      assert(got.exists(p => p._1 == i.toLong && p._2 == i + 1000L),
        s"seed $i: recompressed copy not reported")
      assert(got.exists(p => p._1 == i.toLong && p._2 == i + 2000L),
        s"seed $i: brightness copy not reported")
      assert(got.exists(p => p._1 == i.toLong && p._2 == i + 3000L),
        s"seed $i: resized copy not reported")
    }
  }
}
