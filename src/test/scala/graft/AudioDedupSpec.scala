package graft

import graft.operators.AudioDedupOps
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Audio perceptual-fingerprint near-dup: planted-transform recall,
  * non-dup separation, codec/container plumbing, and exact
  * banded-join/brute-force equivalence — the [[ImageDedupSpec]]
  * discipline applied to the audio modality. */
class AudioDedupSpec extends AnyFunSuite with BeforeAndAfterAll
    with TempDirCleanup {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  private lazy val fps =
    AudioDedupOps.audioAssets(AudioDedupOps.NumClips)
      .map(AudioDedupOps.fingerprintAsset)
  private def fpOf(id: Long): Long =
    fps.find(_.asset_id == id).get.afp
  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("planted near-dup transforms stay within the Hamming budget: " +
      "container re-encode and x2 gain exactly 0 (the exact-invariance " +
      "arguments), 90% decimation <= MaxHamming") {
    for (i <- 0 until AudioDedupOps.DupSeeds) {
      val base = fpOf(i.toLong)
      assert(ham(base, fpOf(i + 1000L)) == 0,
        s"seed $i: container re-encode changed the fingerprint " +
          "(identical samples must hash identically)")
      assert(ham(base, fpOf(i + 2000L)) == 0,
        s"seed $i: x2 gain changed the fingerprint (degree-1 " +
          "homogeneity argument violated)")
      val dResample = ham(base, fpOf(i + 3000L))
      assert(dResample <= AudioDedupOps.MaxHamming,
        s"seed $i: 90% decimation landed at Hamming $dResample > " +
          s"${AudioDedupOps.MaxHamming}")
    }
  }

  test("distinct base clips are separated beyond the threshold") {
    val base = (0 until AudioDedupOps.NumClips).map(i => fpOf(i.toLong))
    val dists = for {
      a <- base.indices; b <- base.indices if a < b
    } yield ham(base(a), base(b))
    // measured min = 15 vs MaxHamming = 6: no false positive possible,
    // with margin against fixture drift (the +4 headroom rule)
    assert(dists.min > AudioDedupOps.MaxHamming + 4,
      s"closest non-dup base pair at Hamming ${dists.min} — too close " +
        s"to the ${AudioDedupOps.MaxHamming} threshold")
  }

  test("re-encoded variant is a genuinely different container (bytes " +
      "differ, decoded samples identical), not a byte copy") {
    val assets = AudioDedupOps.audioAssets(AudioDedupOps.NumClips)
    def payload(id: Long) = assets.find(_.asset_id == id).get.payload
    for (i <- 0 until AudioDedupOps.DupSeeds) {
      assert(!java.util.Arrays.equals(payload(i.toLong), payload(i + 1000L)),
        s"seed $i: re-encode produced identical bytes — the d=0 claim " +
          "would be vacuous")
      assert(AudioDedupOps.pcmSamples(payload(i.toLong)).toSeq ==
        AudioDedupOps.pcmSamples(payload(i + 1000L)).toSeq,
        s"seed $i: the javax.sound decode must see through the extra " +
          "container chunk to identical samples")
    }
  }

  test("decode handles the 8-bit unsigned WAV shape the multimodal " +
      "fixture ships (centered at zero)") {
    // a MultimodalOps audio asset is PCM_UNSIGNED 8-bit mono
    val a = graft.operators.MultimodalOps.assets(4)
      .find(_.kind == "audio").get
    val s = AudioDedupOps.pcmSamples(a.payload)
    assert(s.nonEmpty && s.forall(v => v >= -128 && v <= 127),
      s"8-bit decode must center samples at zero: " +
        s"min=${s.min} max=${s.max}")
  }

  test("banded pipeline matches the declared band-OR semantics and " +
      "surfaces every planted pair") {
    import spark.implicits._
    val pairs = AudioDedupOps.afpNearDupPairs(
      AudioDedupOps.audioFingerprints(spark, AudioDedupOps.NumClips))
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming"))).toSet
    // brute force under the SAME declared semantics (band-OR candidate
    // + Hamming verify) — the pipeline must match it exactly while no
    // band bucket exceeds the cap (none does on this fixture)
    def bands(h: Long): Seq[Long] =
      (0 until AudioDedupOps.NumBands).map(k =>
        (h >>> ((AudioDedupOps.NumBands - 1 - k) * 16)) & 0xffffL)
    val brute = (for {
      a <- fps; b <- fps if a.asset_id < b.asset_id
      d = ham(a.afp, b.afp)
      if d <= AudioDedupOps.MaxHamming
      if bands(a.afp).zip(bands(b.afp)).exists(p => p._1 == p._2)
    } yield (a.asset_id, b.asset_id, d)).toSet
    assert(pairs == brute,
      s"banded=${pairs.size} brute=${brute.size}: " +
        s"diff=${(pairs diff brute) ++ (brute diff pairs)}")
    // every planted variant pairs with its source
    for (i <- 0 until AudioDedupOps.DupSeeds; off <- Seq(1000L, 2000L, 3000L))
      assert(pairs.exists(p => p._1 == i.toLong && p._2 == i + off),
        s"planted pair ($i, ${i + off}) missed")
  }

  test("corrupt payloads drop deterministically from the fingerprint " +
      "path instead of killing the job") {
    import spark.implicits._
    val garbage = AudioDedupOps.AudioAsset(999L,
      Array.fill[Byte](64)(0x2a))
    val tooShort = AudioDedupOps.AudioAsset(998L, // valid WAV, < 32 samples
      AudioDedupOps.wav16(Array.fill(8)(100), 8000))
    val batch = (AudioDedupOps.audioAssets(4).filter(_.asset_id < 4L)
      :+ garbage :+ tooShort).toDF()
    val ids = AudioDedupOps.audioHashRows(batch)
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L, 1L, 2L, 3L),
      s"undecodable clips must drop, valid ones fingerprint: $ids")
  }

  test("afp clusters: every planted quadruple collapses to one " +
      "component labeled by its base clip") {
    val comps = AudioDedupOps.audioClusters.fn(spark, "").collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("comp")).toMap
    for (i <- 0 until AudioDedupOps.DupSeeds;
         off <- Seq(0L, 1000L, 2000L, 3000L))
      assert(comps.get(i + off).contains(i.toLong),
        s"asset ${i + off}: ${comps.get(i + off)} != $i")
    val baseComps = (0 until AudioDedupOps.DupSeeds)
      .map(i => comps(i.toLong))
    assert(baseComps.distinct.size == baseComps.size,
      s"two planted quadruples merged: $baseComps")
  }

  test("at-rest afp index: build/append/probe lifecycle finds a " +
      "re-encoded copy without re-decoding history, replays " +
      "self-match at Hamming 0, default threshold is kind-aware") {
    import spark.implicits._
    import graft.store.{GraftStore, IndexStore}
    val store = new GraftStore(tempDir("graft-idx-afp"))
    val assets = AudioDedupOps.audioAssets(AudioDedupOps.NumClips)
    val base = assets.filter(_.asset_id < AudioDedupOps.NumClips)
    IndexStore.build(store, "afp", base.toDF())
    // probe: a re-encoded copy of clip 3 (planted id 1003) + a fresh
    // unrelated clip — searched with the DEFAULT threshold (must
    // resolve to the audio MaxHamming, not 0.4)
    val copy3 = assets.find(_.asset_id == 1003L).get
    val freshClip = AudioDedupOps.audioAssets(AudioDedupOps.NumClips + 8)
      .find(_.asset_id == AudioDedupOps.NumClips + 5L).get
    val probe = Seq(
      AudioDedupOps.AudioAsset(9003L, copy3.payload),
      AudioDedupOps.AudioAsset(9100L, freshClip.payload)).toDF()
    val hits = IndexStore.search(store, spark, "afp", probe).collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("existing_id"),
        r.getAs[Int]("hamming")))
    assert(hits.contains((9003L, 3L, 0)),
      s"re-encoded copy must hit its source at Hamming 0: " +
        s"${hits.mkString(",")}")
    assert(!hits.exists(_._1 == 9100L),
      s"fresh clip must hit nothing: ${hits.mkString(",")}")
    // append the fresh clip, re-probe: self-match at 0 (replay safety)
    IndexStore.append(store, "afp",
      Seq(AudioDedupOps.AudioAsset(9100L, freshClip.payload)).toDF())
    val hits2 = IndexStore.search(store, spark, "afp",
      Seq(AudioDedupOps.AudioAsset(9100L, freshClip.payload)).toDF())
      .collect()
      .map(r => (r.getAs[Long]("existing_id"), r.getAs[Int]("hamming")))
    assert(hits2.toSet == Set((9100L, 0)),
      s"appended clip must self-match only: ${hits2.mkString(",")}")
    // compact is afp-aware (global cap re-application keeps rows)
    val (dropped, leaves) = IndexStore.compact(store, spark, "afp")
    assert(dropped == 0L && leaves > 0L, s"($dropped, $leaves)")
  }

  test("fingerprint guards fail loudly: too-short and over-long input") {
    intercept[IllegalArgumentException] {
      AudioDedupOps.afp64(Array.fill(16)(0))
    }
    intercept[IllegalArgumentException] {
      AudioDedupOps.afp64(new Array[Int](AudioDedupOps.MaxSamples + 1))
    }
  }
}
