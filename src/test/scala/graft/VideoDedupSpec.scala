package graft

import graft.operators.{ImageDedupOps, MultimodalOps, VideoDedupOps}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Frame-based video near-dup: planted-transform recall (re-encode,
  * trim, per-frame resize), cross-video separation, the
  * majority-coverage verdict (a single shared still is NOT a dup),
  * corrupt-frame denominator semantics, and exact banded/brute-force
  * equivalence — the [[AudioDedupSpec]] discipline transposed to
  * frames. */
class VideoDedupSpec extends AnyFunSuite with BeforeAndAfterAll
    with TempDirCleanup {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  private lazy val frames = VideoDedupOps.videoFrames(VideoDedupOps.NumVideos)
  private def hash(p: Array[Byte]): Long =
    ImageDedupOps.dhash64(MultimodalOps.decodeImage(p))
  private def frameHashes(id: Long): Seq[(Int, Long)] =
    frames.filter(_.video_id == id).sortBy(_.frame_idx)
      .map(fr => fr.frame_idx -> hash(fr.payload))
  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("planted frame transforms stay within the Hamming budget: " +
      "re-encode d=0 per frame, trim byte-identical, 90% resize <= " +
      "MaxHamming per frame") {
    for (v <- 0 until VideoDedupOps.DupSeeds) {
      val base = frameHashes(v.toLong).toMap
      frameHashes(v + 1000L).foreach { case (f, h) =>
        assert(ham(base(f), h) == 0, s"video $v frame $f: re-encode moved")
      }
      val trimmed = frameHashes(v + 2000L)
      assert(trimmed.size == VideoDedupOps.TrimFrames)
      trimmed.foreach { case (f, h) =>
        assert(base(f) == h, s"video $v frame $f: trim must be identical")
      }
      frameHashes(v + 3000L).foreach { case (f, h) =>
        assert(ham(base(f), h) <= ImageDedupOps.MaxHamming,
          s"video $v frame $f: resize at ${ham(base(f), h)}")
      }
    }
  }

  test("frames across DIFFERENT base videos (and within one video) " +
      "are separated beyond the threshold — no accidental verdicts") {
    val all = (0 until VideoDedupOps.NumVideos).flatMap(v =>
      frameHashes(v.toLong).map(fh => (v.toLong, fh._1, fh._2)))
    val dists = for {
      a <- all; b <- all
      if a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
    } yield ham(a._3, b._3)
    assert(dists.min > ImageDedupOps.MaxHamming,
      s"closest unrelated frame pair at Hamming ${dists.min}")
  }

  test("banded pipeline matches the declared semantics exactly and " +
      "surfaces every planted video pair") {
    val pairs = VideoDedupOps.videoNearDupPairs(
      VideoDedupOps.videoFingerprints(spark, VideoDedupOps.NumVideos))
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming"))).toSet
    // brute force under the SAME declared semantics
    val counts = frames.groupBy(_.video_id).view.mapValues(_.size).toMap
    val rows = frames.map(fr =>
      (fr.video_id, fr.frame_idx, counts(fr.video_id), hash(fr.payload)))
    def bands(h: Long): Seq[Long] =
      (0 until ImageDedupOps.NumBands).map(k =>
        (h >>> ((ImageDedupOps.NumBands - 1 - k) * 16)) & 0xffffL)
    val cand = for {
      a <- rows; b <- rows if a._1 < b._1
      d = ham(a._4, b._4)
      if d <= ImageDedupOps.MaxHamming
      if bands(a._4).zip(bands(b._4)).exists(p => p._1 == p._2)
    } yield (a, b, d)
    val brute = cand.groupBy(t => (t._1._1, t._2._1)).flatMap {
      case ((ia, ib), ms) =>
        val na = ms.head._1._3
        val nb = ms.head._2._3
        val ma = ms.map(_._1._2).distinct.size
        val mb = ms.map(_._2._2).distinct.size
        if (ma * 2 > na && mb * 2 > nb)
          Some((ia, ib, ms.map(_._3).max))
        else None
    }.toSet
    assert(pairs == brute,
      s"banded=${pairs.size} brute=${brute.size}: " +
        s"diff=${(pairs diff brute) ++ (brute diff pairs)}")
    for (v <- 0 until VideoDedupOps.DupSeeds;
         off <- Seq(1000L, 2000L, 3000L))
      assert(pairs.exists(p => p._1 == v.toLong && p._2 == v + off),
        s"planted pair ($v, ${v + off}) missed")
  }

  test("a single shared still between two otherwise-different videos " +
      "is NOT a duplicate verdict (majority coverage on both sides)") {
    import spark.implicits._
    // video 800 = frame 0 of video 5 + five fresh frames of video 801's
    // generator space... build: one copied frame + 5 frames from an
    // unseen seed range
    val copied = frames.find(f => f.video_id == 5L && f.frame_idx == 0).get
    val fresh = (1 to 5).map(f => VideoDedupOps.VideoFrame(800L, f,
      ImageDedupOps.encodePng(ImageDedupOps.renderSmooth(
        77000L + f, 112, 96, 0))))
    val mixed = (VideoDedupOps.VideoFrame(800L, 0, copied.payload) +: fresh) ++
      frames.filter(_.video_id == 5L)
    val pairs = VideoDedupOps.videoNearDupPairs(
      VideoDedupOps.videoHashRows(mixed.toDF())).collect()
    assert(pairs.isEmpty,
      s"one matched frame of six must not verdict: ${pairs.mkString(",")}")
    // sanity: the frame-level match DOES exist
    val fp = VideoDedupOps.videoFramePairs(
      VideoDedupOps.videoHashRows(mixed.toDF())).collect()
    assert(fp.nonEmpty, "fixture: the shared still must band-match")
  }

  test("a corrupt frame drops from rows AND denominator: the video " +
      "still verdicts against its intact copy") {
    import spark.implicits._
    val mine = frames.filter(_.video_id == 2L)
    // 900 = video 2 with frame 5's payload corrupted; against base 2:
    // matched 5 of base's 6 (majority) and 5 of 900's 5 hashable
    val damaged = mine.map(fr =>
      if (fr.frame_idx == 5)
        VideoDedupOps.VideoFrame(900L, 5, Array.fill[Byte](40)(0x7f))
      else VideoDedupOps.VideoFrame(900L, fr.frame_idx, fr.payload))
    val rows = VideoDedupOps.videoHashRows((mine ++ damaged).toDF())
    val n900 = rows.filter($"video_id" === 900L)
      .select("n_frames").distinct().collect().map(_.getInt(0)).toSeq
    assert(n900 == Seq(5), s"hashable denominator must be 5: $n900")
    val pairs = VideoDedupOps.videoNearDupPairs(rows).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming"))).toSet
    assert(pairs == Set((2L, 900L, 0)), s"got $pairs")
  }

  test("videoFrameRejects names the frame-level drop reason — the " +
      "denominator audit") {
    import spark.implicits._
    val mine = frames.filter(_.video_id == 1L).map(fr =>
      if (fr.frame_idx == 2)
        VideoDedupOps.VideoFrame(1L, 2, Array.fill[Byte](24)(0x55))
      else fr)
    val rej = VideoDedupOps.videoFrameRejects(mine.toDF()).collect()
      .map(r => (r.getAs[Long]("video_id"), r.getAs[Int]("frame_idx"),
        r.getAs[String]("reason")))
    assert(rej.toSeq == Seq((1L, 2, "corrupt")), s"${rej.mkString(",")}")
  }

  test("video decontamination: a re-encoded benchmark flags its " +
      "corpus source, a TRIMMED benchmark flags under majority " +
      "coverage, a fresh one flags nothing") {
    val hits = VideoDedupOps.videoDecontaminate.fn(spark, "").collect()
      .map(r => (r.getAs[Long]("video_id"), r.getAs[Long]("eval_id"),
        r.getAs[Int]("hamming"))).toSet
    assert(hits.contains((0L, 9000L, 0)),
      s"re-encoded benchmark must flag video 0: $hits")
    assert(hits.contains((1L, 9001L, 0)),
      s"trimmed benchmark must flag video 1 (4 of 6 frames): $hits")
    assert(!hits.exists(_._2 == 9100L),
      s"fresh benchmark video must flag nothing: $hits")
  }

  test("perceptualDupes at rest equals the batch pair operator — no " +
      "payload decode, fingerprints reconstructed from any surviving " +
      "band row (vhash here; afp/phash share the path)") {
    import spark.implicits._
    import graft.store.{GraftStore, IndexStore}
    val store = new GraftStore(tempDir("graft-vhash-dupes"))
    val all = frames.map(f =>
      (f.video_id, f.frame_idx, f.payload))
      .toDF("asset_id", "frame_idx", "payload")
    IndexStore.build(store, "vhash", all)
    val atRest = IndexStore.perceptualDupes(store, spark, "vhash")
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming"))).toSet
    val batch = VideoDedupOps.videoNearDupPairs(
      VideoDedupOps.videoHashRows(frames.toDF()).localCheckpoint())
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming"))).toSet
    assert(atRest == batch,
      s"atRest=${atRest.size} batch=${batch.size}: " +
        s"diff=${(atRest diff batch) ++ (batch diff atRest)}")
    assert(atRest.nonEmpty, "fixture must contain planted pairs")
  }

  test("majority boundary on scene-sharing videos (the temporally-" +
      "correlated shape real videos have): sharing exactly HALF the " +
      "frames is NOT a verdict, sharing a majority IS") {
    import spark.implicits._
    def still(seed: Long) = ImageDedupOps.encodePng(
      ImageDedupOps.renderSmooth(seed, 112, 96, 0))
    // scene S = one still repeated (consecutive frames of a static
    // shot hash identically); fillers are unique stills
    val sceneS = still(70001L)
    def vid(id: Long, shared: Int, fillerBase: Long) =
      (0 until 6).map(f => VideoDedupOps.VideoFrame(id, f,
        if (f < shared) sceneS else still(fillerBase + f)))
    // half-sharing pair: 3 of 6 frames each — 3*2 > 6 is FALSE
    val half = vid(10L, 3, 71000L) ++ vid(11L, 3, 72000L)
    val pairsHalf = VideoDedupOps.videoNearDupPairs(
      VideoDedupOps.videoHashRows(half.toDF())).collect()
    assert(pairsHalf.isEmpty,
      s"half-sharing must not verdict: ${pairsHalf.mkString(",")}")
    // majority-sharing pair: 4 of 6 frames each — verdict fires
    val most = vid(20L, 4, 73000L) ++ vid(21L, 4, 74000L)
    val pairsMost = VideoDedupOps.videoNearDupPairs(
      VideoDedupOps.videoHashRows(most.toDF())).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming")))
    assert(pairsMost.toSeq == Seq((20L, 21L, 0)),
      s"majority-sharing must verdict: ${pairsMost.mkString(",")}")
    // fillers really are distinct (the boundary claim is about the
    // shared scene, not accidental filler matches)
    val fillerHashes = (71000L until 71006L).map(s =>
      ImageDedupOps.dhash64(MultimodalOps.decodeImage(still(s))))
    assert(fillerHashes.distinct.size == fillerHashes.size)
  }

  test("video clusters: every planted group collapses to one component " +
      "labeled by its base video") {
    val comps = VideoDedupOps.videoClusters.fn(spark, "").collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("comp")).toMap
    for (v <- 0 until VideoDedupOps.DupSeeds;
         off <- Seq(0L, 1000L, 2000L, 3000L))
      assert(comps.get(v + off).contains(v.toLong),
        s"video ${v + off}: ${comps.get(v + off)} != $v")
    val baseComps = (0 until VideoDedupOps.DupSeeds).map(v => comps(v.toLong))
    assert(baseComps.distinct.size == baseComps.size,
      s"two planted groups merged: $baseComps")
  }
}
