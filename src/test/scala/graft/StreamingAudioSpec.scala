package graft

import graft.operators.AudioDedupOps
import graft.store.{GraftStore, IndexStore}
import graft.streaming.StreamingAudio
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming audio ingest over the `afp` index — the
  * [[StreamingImagesSpec]] contract for the audio modality. */
class StreamingAudioSpec extends AnyFunSuite with BeforeAndAfterAll
    with TempDirCleanup {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  private lazy val assets =
    AudioDedupOps.audioAssets(AudioDedupOps.NumClips)
  private def asset(id: Long) = assets.find(_.asset_id == id).get

  private def acceptedIds(store: GraftStore): Set[Long] =
    StreamingAudio.accepted(spark, store)
      .select("asset_id").collect().map(_.getLong(0)).toSet

  test("gates compose: an intra-batch gain pair keeps the smaller id, " +
      "a cross-batch re-encoded copy drops, fresh clips survive, and " +
      "the accepted set and index stay in lockstep") {
    import spark.implicits._
    val store = new GraftStore(tempDir("graft-saud"))
    StreamingAudio.processBatch(store,
      assets.filter(_.asset_id < 10).toDF())
    assert(acceptedIds(store) == (0L until 10L).toSet)

    // batch 2: an intra-batch pair (fresh clip 20 + its x2-gain twin
    // under a larger id — d=0, larger loses), a cross-batch re-encoded
    // copy of accepted clip 3 (planted id 1003 — drops), one fresh clip
    // 203 = exact x2-gain re-render of 202's samples (the fingerprint
    // is rate-independent — time cells are relative positions — so any
    // container rate yields d = 0 against 202)
    val gainTwin = AudioDedupOps.wav16(
      AudioDedupOps.pcmSamples(asset(21L).payload).map(_ * 2), 8000)
    val b2 = Seq(
      AudioDedupOps.AudioAsset(200L, asset(20L).payload),
      AudioDedupOps.AudioAsset(201L, asset(1003L).payload),
      AudioDedupOps.AudioAsset(202L, asset(21L).payload),
      AudioDedupOps.AudioAsset(203L, gainTwin)).toDF()
    StreamingAudio.processBatch(store, b2)
    val after = acceptedIds(store)
    assert(after == (0L until 10L).toSet ++ Set(200L, 202L),
      s"got $after")
    val idxIds = IndexStore.read(store, spark, "afp")
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(idxIds == after)
  }

  test("a corrupt payload in a batch is rejected (never accepted, " +
      "never kills the gate) while valid clips dedup normally") {
    import spark.implicits._
    val store = new GraftStore(tempDir("graft-saud-corrupt"))
    val garbage = AudioDedupOps.AudioAsset(999L,
      Array.fill[Byte](80)(0x11))
    val b = (assets.filter(_.asset_id < 4) :+ garbage).toDF()
    StreamingAudio.processBatch(store, b)
    assert(acceptedIds(store) == (0L until 4L).toSet,
      s"corrupt clip must fail curation: ${acceptedIds(store)}")
  }

  test("a replayed micro-batch commits nothing (exactly-once)") {
    import spark.implicits._
    val store = new GraftStore(tempDir("graft-saud-replay"))
    val batch = assets.filter(_.asset_id < 8).toDF()
    StreamingAudio.processBatch(store, batch)
    val snap1 = store.currentSnapshot()
    assert(acceptedIds(store) == (0L until 8L).toSet)
    StreamingAudio.processBatch(store, batch)
    assert(store.currentSnapshot() == snap1,
      "replay committed a new snapshot")
  }

  test("end-to-end stream: cross-batch planted transforms drop, " +
      "survivors accepted once") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val store = new GraftStore(tempDir("graft-saud-e2e"))
    val ckpt = tempDir("graft-saud-ckpt")
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Byte])]
    val q = StreamingAudio.runToAccepted(
      mem.toDF().toDF("asset_id", "payload"), store, ckpt)
    mem.addData((0 until 6).map(i => (i.toLong, asset(i.toLong).payload)))
    q.processAllAvailable()
    // x2-gain variants of 0..5 (d = 0 against history -> drop) + fresh 6
    mem.addData((0 until 6).map(i =>
      (500L + i, asset(i + 2000L).payload)) :+ (6L, asset(6L).payload))
    q.processAllAvailable()
    q.stop()
    assert(acceptedIds(store) == (0L until 7L).toSet,
      s"got ${acceptedIds(store)}")
  }
}
