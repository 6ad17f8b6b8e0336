package graft

import graft.operators.AudioDedupOps
import graft.store.{GraftStore, IndexStore}
import graft.streaming.StreamingAudio
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
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

  test("LONG clips are first-class in the gate: accepted, indexed per " +
      "chunk, a later re-encoded long copy drops cross-batch") {
    import spark.implicits._
    val store = new GraftStore(tempDir("graft-saud-long"))
    val b1 = Seq(asset(4000L), asset(4001L), asset(0L)).toDF()
    val s1 = StreamingAudio.processBatch(store, b1, collectStats = true).get
    assert(acceptedIds(store) == Set(4000L, 4001L, 0L),
      s"long clips must be accepted, not silently rejected: " +
        s"${acceptedIds(store)}")
    assert(s1.survivors == 3 && s1.exactDropped == 0, s"$s1")
    // each long survivor carries BOTH chunks' band rows at rest
    val chunksAtRest = IndexStore.read(store, spark, "afp")
      .filter(col("asset_id") === 4000L)
      .select("chunk_idx").distinct().collect().map(_.getInt(0)).toSet
    assert(chunksAtRest == Set(0, 1), s"got $chunksAtRest")
    // batch 2: the junk re-encode of 4000 under a new id must drop via
    // the chunk-aware cross probe (both chunks match at d=0)
    val b2 = Seq(
      AudioDedupOps.AudioAsset(700L, asset(5000L).payload),
      asset(1L)).toDF()
    val s2 = StreamingAudio.processBatch(store, b2, collectStats = true).get
    assert(acceptedIds(store) == Set(4000L, 4001L, 0L, 1L),
      s"got ${acceptedIds(store)}")
    assert(s2.crossDropped == 1, s"$s2")
  }

  test("a flood of byte-identical clips (past the band-bucket cap) " +
      "collapses to ONE survivor whose index rows stay live: replay " +
      "commits nothing, a later copy still drops") {
    import spark.implicits._
    val store = new GraftStore(tempDir("graft-saud-flood"))
    // 70 identical payloads: over MaxBucketSize (64) in EVERY band
    // bucket — the round-15 gate dropped these groups wholesale, found
    // no pairs, and accepted the whole flood with no index rows
    val flood = (0 until 70).map(i =>
      AudioDedupOps.AudioAsset(100L + i, asset(0L).payload))
    val stats = StreamingAudio
      .processBatch(store, flood.toDF(), collectStats = true).get
    assert(acceptedIds(store) == Set(100L),
      s"flood must collapse to its smallest id: ${acceptedIds(store)}")
    assert(stats.survivors == 1 && stats.exactDropped == 69, s"$stats")
    val idxRows = IndexStore.read(store, spark, "afp")
      .filter(col("asset_id") === 100L).count()
    assert(idxRows > 0, "the flood survivor must keep live index rows")
    val snap1 = store.currentSnapshot()
    StreamingAudio.processBatch(store, flood.toDF())
    assert(store.currentSnapshot() == snap1,
      "flood replay committed a new snapshot")
    StreamingAudio.processBatch(store,
      Seq(AudioDedupOps.AudioAsset(900L, asset(0L).payload)).toDF())
    assert(acceptedIds(store) == Set(100L),
      s"a later copy of the flood must drop: ${acceptedIds(store)}")
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
