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

  test("corrupt payloads drop deterministically from the hash path " +
      "instead of killing the job") {
    import spark.implicits._
    val garbage = ImageDedupOps.ImageAsset(999L,
      Array.fill[Byte](64)(0x2a))
    val tinyPng = { // valid PNG, below the 9x8 hash grid
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val tiny = ImageDedupOps.ImageAsset(998L, tinyPng)
    val batch = (ImageDedupOps.imageAssets(4).filter(_.asset_id < 4L)
      :+ garbage :+ tiny).toDF()
    val ids = ImageDedupOps.imageHashRows(batch)
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L, 1L, 2L, 3L),
      s"undecodable assets must drop, valid ones hash: $ids")
  }

  test("perceptual decontamination: every benchmark re-encode flags " +
      "its corpus source at d=0, fresh benchmark images flag nothing") {
    val hits = ImageDedupOps.phashDecontaminate.fn(spark, "").collect()
      .map(r => (r.getAs[Long]("asset_id"), r.getAs[Long]("eval_id"),
        r.getAs[Int]("hamming"))).toSet
    for (i <- 0 until 3)
      assert(hits.contains((i.toLong, 9000L + i, 0)),
        s"benchmark re-encode $i must flag its source: $hits")
    assert(!hits.exists(h => h._2 == 9100L || h._2 == 9101L),
      s"fresh benchmark images must flag nothing: $hits")
  }

  test("phash clusters: every planted quadruple collapses to one " +
      "component labeled by its base image") {
    val comps = ImageDedupOps.phashClusters.fn(spark, "").collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("comp")).toMap
    for (i <- 0 until ImageDedupOps.DupSeeds;
         off <- Seq(0L, 1000L, 2000L, 3000L))
      assert(comps.get(i + off).contains(i.toLong),
        s"asset ${i + off}: ${comps.get(i + off)} != $i")
    // no cross-seed merge: distinct bases never share a component
    val baseComps = (0 until ImageDedupOps.DupSeeds)
      .map(i => comps(i.toLong))
    assert(baseComps.distinct.size == baseComps.size,
      s"two planted quadruples merged: $baseComps")
  }

  test("phash search default threshold is kind-aware: omitting it " +
      "means MaxHamming, so a resized copy at Hamming > 0 is found") {
    import spark.implicits._
    import graft.store.{GraftStore, IndexStore}
    val store = new GraftStore(tempDir("graft-idx-phash-def"))
    val assets = ImageDedupOps.imageAssets(ImageDedupOps.NumImages)
    IndexStore.build(store, "phash",
      assets.filter(_.asset_id < ImageDedupOps.NumImages).toDF())
    // the fixture must plant at least one resize at Hamming > 0, or
    // this test could not distinguish MaxHamming from the silent prior
    // default round(0.4) = exact-hash-only (deterministic in-repo
    // fixture — no corpus-drift exposure)
    val resizeD = (0 until ImageDedupOps.DupSeeds)
      .map(i => i -> ham(hashOf(i.toLong), hashOf(i + 3000L))).toMap
    assert(resizeD.values.exists(_ > 0),
      s"fixture renders every 90% resize at d=0: $resizeD")
    val probe = assets
      .filter(a => a.asset_id >= 3000L &&
        a.asset_id < 3000L + ImageDedupOps.DupSeeds)
      .map(a => ImageDedupOps.ImageAsset(a.asset_id + 6000L, a.payload))
      .toDF()
    val hits = IndexStore.search(store, spark, "phash", probe).collect()
      .map(r => (r.getAs[Long]("new_id") - 9000L,
        r.getAs[Long]("existing_id"), r.getAs[Int]("hamming")))
    for (i <- 0 until ImageDedupOps.DupSeeds)
      assert(hits.exists(h => h._1 == i.toLong && h._2 == i.toLong),
        s"resize copy of seed $i missed under the default threshold: " +
          s"${hits.mkString(",")}")
    assert(hits.exists(_._3 > 0),
      "no hit above Hamming 0 — the default did not widen beyond " +
        "exact-hash")
  }

  test("at-rest phash index: build/append/probe lifecycle finds a " +
      "recompressed copy without re-decoding history, replays " +
      "self-match at Hamming 0") {
    import spark.implicits._
    import graft.store.{GraftStore, IndexStore}
    val store = new GraftStore(tempDir("graft-idx-phash"))
    val assets = ImageDedupOps.imageAssets(ImageDedupOps.NumImages)
    val base = assets.filter(_.asset_id < ImageDedupOps.NumImages)
    IndexStore.build(store, "phash", base.toDF())
    // probe 1: a recompressed copy of image 3 (planted id 1003 in the
    // fixture is exactly that transform) + a fresh unrelated image
    val copy3 = assets.find(_.asset_id == 1003L).get
    val freshImg = ImageDedupOps.imageAssets(ImageDedupOps.NumImages + 8)
      .find(_.asset_id == ImageDedupOps.NumImages + 5L).get
    val probe = Seq(
      ImageDedupOps.ImageAsset(9003L, copy3.payload),
      ImageDedupOps.ImageAsset(9100L, freshImg.payload)).toDF()
    val hits = IndexStore.search(store, spark, "phash", probe,
      ImageDedupOps.MaxHamming.toDouble).collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("existing_id"),
        r.getAs[Int]("hamming")))
    assert(hits.contains((9003L, 3L, 0)),
      s"recompressed copy must hit its source at Hamming 0: " +
        s"${hits.mkString(",")}")
    assert(!hits.exists(_._1 == 9100L),
      s"fresh image must hit nothing: ${hits.mkString(",")}")
    // append the fresh image, re-probe: now it self-matches at 0 (the
    // replay-safety property) and still matches nothing else
    IndexStore.append(store, "phash",
      Seq(ImageDedupOps.ImageAsset(9100L, freshImg.payload)).toDF())
    val hits2 = IndexStore.search(store, spark, "phash",
      Seq(ImageDedupOps.ImageAsset(9100L, freshImg.payload)).toDF(),
      ImageDedupOps.MaxHamming.toDouble).collect()
      .map(r => (r.getAs[Long]("existing_id"), r.getAs[Int]("hamming")))
    assert(hits2.toSet == Set((9100L, 0)),
      s"appended image must self-match only: ${hits2.mkString(",")}")
    // compact is phash-aware (global cap re-application keeps rows)
    val cr = IndexStore.compact(store, spark, "phash")
    val (dropped, leaves) = (cr.dropped, cr.leaves)
    assert(dropped == 0L && leaves > 0L, s"($dropped, $leaves)")
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
