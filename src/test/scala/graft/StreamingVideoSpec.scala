package graft

import graft.operators.{ImageDedupOps, VideoDedupOps}
import graft.store.{GraftStore, IndexStore}
import graft.streaming.StreamingVideo
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming video ingest over the `vhash` index — the
  * [[StreamingAudioSpec]] contract for the video modality. Batches are
  * (asset_id, frame_idx, payload) frame rows; asset_id is the video. */
class StreamingVideoSpec extends AnyFunSuite with BeforeAndAfterAll
    with TempDirCleanup {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  private lazy val frames =
    VideoDedupOps.videoFrames(VideoDedupOps.NumVideos)
  /** Frame rows of video `id`, re-keyed to gate schema under `as`. */
  private def video(id: Long, as: Long): Seq[(Long, Int, Array[Byte])] =
    frames.filter(_.video_id == id)
      .map(f => (as, f.frame_idx, f.payload))

  private def acceptedVideos(store: GraftStore): Set[Long] =
    StreamingVideo.accepted(spark, store)
      .select("asset_id").distinct().collect().map(_.getLong(0)).toSet

  test("gates compose: an intra-batch identical pair collapses to the " +
      "smaller id, a cross-batch trimmed copy drops under majority " +
      "coverage, fresh videos survive, accepted frames and index stay " +
      "in lockstep") {
    import spark.implicits._
    val store = new GraftStore(tempDir("graft-svid"))
    val b1 = (video(0L, 0L) ++ video(1L, 1L) ++ video(2L, 2L))
      .toDF("asset_id", "frame_idx", "payload")
    val s1 = StreamingVideo.processBatch(store, b1, collectStats = true).get
    assert(acceptedVideos(store) == Set(0L, 1L, 2L), s"$s1")
    assert(s1.survivors == 3, s"$s1")
    // accepted table holds EVERY frame of each survivor
    val frameCount = StreamingVideo.accepted(spark, store)
      .filter(col("asset_id") === 0L).count()
    assert(frameCount == VideoDedupOps.FramesPerVideo)

    // batch 2: an intra-batch pair (video 3's frames under TWO ids —
    // byte-identical, so the exact-signature collapse keeps the
    // smaller), a cross-batch TRIMMED copy of accepted video 1 (4 of
    // 6 frames — majority on both sides, drops), and a fresh video 4
    val b2 = (video(3L, 300L) ++ video(3L, 301L) ++
      video(2001L, 400L) ++ // 2001 = trimmed variant of 1
      video(4L, 4L)).toDF("asset_id", "frame_idx", "payload")
    val s2 = StreamingVideo.processBatch(store, b2, collectStats = true).get
    assert(acceptedVideos(store) == Set(0L, 1L, 2L, 300L, 4L),
      s"got ${acceptedVideos(store)} ($s2)")
    assert(s2.crossDropped == 1 && s2.exactDropped == 1, s"$s2")
    val idxIds = IndexStore.read(store, spark, "vhash")
      .select("asset_id").distinct().collect().map(_.getLong(0)).toSet
    assert(idxIds == acceptedVideos(store))
  }

  test("a replayed micro-batch commits nothing (exactly-once): every " +
      "frame self-matches, coverage is total, the verdict fires") {
    import spark.implicits._
    val store = new GraftStore(tempDir("graft-svid-replay"))
    val batch = (0 until 4).flatMap(v => video(v.toLong, v.toLong))
      .toDF("asset_id", "frame_idx", "payload")
    StreamingVideo.processBatch(store, batch)
    val snap1 = store.currentSnapshot()
    assert(acceptedVideos(store) == (0L until 4L).toSet)
    StreamingVideo.processBatch(store, batch)
    assert(store.currentSnapshot() == snap1,
      "replay committed a new snapshot")
  }

  test("a video with one corrupt frame is gated on its hashable " +
      "frames: accepted fresh, then a re-delivery with the SAME " +
      "damage drops as an exact dup") {
    import spark.implicits._
    val store = new GraftStore(tempDir("graft-svid-corrupt"))
    val damaged = video(5L, 500L).map { case (id, f, p) =>
      if (f == 5) (id, f, Array.fill[Byte](32)(0x3c)) else (id, f, p)
    }
    StreamingVideo.processBatch(store,
      damaged.toDF("asset_id", "frame_idx", "payload"))
    assert(acceptedVideos(store) == Set(500L))
    // only HASHABLE frames commit (round 17): the corrupt frame 5 was
    // excluded from hashing, the n_frames denominator, and the vhash
    // index — committing it would put a payload at rest the index can
    // never cover. The frame rejects audit is where it is reported.
    val frames = StreamingVideo.accepted(spark, store)
      .filter(col("asset_id") === 500L)
      .select("frame_idx").collect().map(_.getInt(0)).toSet
    assert(!frames.contains(5) && frames.nonEmpty,
      s"accepted frames must be the hashable set, got $frames")
    val s2 = StreamingVideo.processBatch(store,
      damaged.map { case (_, f, p) => (501L, f, p) }
        .toDF("asset_id", "frame_idx", "payload"),
      collectStats = true).get
    assert(acceptedVideos(store) == Set(500L),
      s"re-delivered damaged video must drop: ${acceptedVideos(store)}")
    assert(s2.crossDropped == 1, s"$s2")
  }

  test("end-to-end stream: cross-batch re-encoded copies drop, " +
      "survivors accepted once") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val store = new GraftStore(tempDir("graft-svid-e2e"))
    val ckpt = tempDir("graft-svid-ckpt")
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Int, Array[Byte])]
    val q = StreamingVideo.runToAccepted(
      mem.toDF().toDF("asset_id", "frame_idx", "payload"), store, ckpt)
    mem.addData((0 until 3).flatMap(v => video(v.toLong, v.toLong)))
    q.processAllAvailable()
    // re-encoded variants of 0..2 (per-frame d = 0 vs history -> drop)
    // + fresh video 5
    mem.addData((0 until 3).flatMap(v =>
      video(v + 1000L, 600L + v)) ++ video(5L, 5L))
    q.processAllAvailable()
    q.stop()
    assert(acceptedVideos(store) == Set(0L, 1L, 2L, 5L),
      s"got ${acceptedVideos(store)}")
  }

  test("at-rest vhash lifecycle: build from frames, probe a trimmed " +
      "copy at the kind-aware default threshold, append, compact " +
      "keeps every asset live") {
    import spark.implicits._
    val store = new GraftStore(tempDir("graft-idx-vhash"))
    // base holds videos 0..5 so the appended video 6 is genuinely new
    val base = (0 until 6)
      .flatMap(v => video(v.toLong, v.toLong))
      .toDF("asset_id", "frame_idx", "payload")
    IndexStore.build(store, "vhash", base)
    // probe: the trimmed variant of video 1 + a fresh unrelated video
    val probe = (video(2001L, 9001L) ++ // trimmed variant of 1
      Seq((9100L, 0, ImageDedupOps.encodePng(
        ImageDedupOps.renderSmooth(88001L, 112, 96, 0)))))
      .toDF("asset_id", "frame_idx", "payload")
    val hits = IndexStore.search(store, spark, "vhash", probe).collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("existing_id"),
        r.getAs[Int]("hamming")))
    assert(hits.contains((9001L, 1L, 0)),
      s"trimmed copy must hit its source (majority both sides): " +
        s"${hits.mkString(",")}")
    assert(!hits.exists(_._1 == 9100L),
      s"fresh single-frame video must hit nothing: ${hits.mkString(",")}")
    // append a new video; it self-matches on re-probe (replay safety)
    IndexStore.append(store, "vhash",
      video(6L, 9200L).toDF("asset_id", "frame_idx", "payload"))
    val hits2 = IndexStore.search(store, spark, "vhash",
      video(6L, 9200L).toDF("asset_id", "frame_idx", "payload"))
      .collect()
      .map(r => (r.getAs[Long]("existing_id"), r.getAs[Int]("hamming")))
    assert(hits2.toSet == Set((9200L, 0)), s"${hits2.mkString(",")}")
    val cr = IndexStore.compact(store, spark, "vhash")
    val (dropped, leaves) = (cr.dropped, cr.leaves)
    assert(dropped == 0L && leaves > 0L, s"($dropped, $leaves)")
    val hits3 = IndexStore.search(store, spark, "vhash",
      video(2001L, 9001L).toDF("asset_id", "frame_idx", "payload"))
      .collect().map(r => (r.getAs[Long]("existing_id"),
        r.getAs[Int]("hamming"))).toSet
    assert(hits3.contains((1L, 0)),
      s"post-compact probe lost its source: $hits3")
  }
}
