package graft

import graft.operators.ImageDedupOps
import graft.store.{GraftStore, IndexStore}
import graft.streaming.StreamingImages
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming image ingest over the `phash` index: per-batch gates
  * (intra-batch + cross-batch perceptual dedup), atomic assets+index
  * commits, exactly-once replay — the [[StreamingImages]] analogue of
  * StreamingVectorsSpec. */
class StreamingImagesSpec extends AnyFunSuite with BeforeAndAfterAll
    with TempDirCleanup {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  private lazy val assets =
    ImageDedupOps.imageAssets(ImageDedupOps.NumImages)
  private def asset(id: Long) = assets.find(_.asset_id == id).get

  private def acceptedIds(store: GraftStore): Set[Long] =
    StreamingImages.accepted(spark, store)
      .select("asset_id").collect().map(_.getLong(0)).toSet

  test("gates compose: an intra-batch recompressed pair keeps the " +
      "smaller id, a cross-batch planted dup drops, fresh images " +
      "survive, and the accepted set and index stay in lockstep") {
    import spark.implicits._
    val store = new GraftStore(tempDir("graft-simg"))
    // batch 1: base images 0..9
    val b1 = assets.filter(_.asset_id < 10).toDF()
    StreamingImages.processBatch(store, b1)
    assert(acceptedIds(store) == (0L until 10L).toSet)

    // batch 2: an INTRA-batch near-dup pair (a fresh base image and
    // its recompressed copy under a larger id — the larger id loses),
    // a CROSS-batch recompressed copy of accepted image 3 (planted
    // fixture id 1003 is exactly that transform — drops), and one
    // fresh image
    val fresh20 = asset(20L)
    val b2 = Seq(
      ImageDedupOps.ImageAsset(200L, fresh20.payload),
      ImageDedupOps.ImageAsset(201L,
        asset(1003L).payload.clone()), // copy of image 3 -> cross drop
      ImageDedupOps.ImageAsset(202L, asset(21L).payload),
      ImageDedupOps.ImageAsset(203L, // recompress of 202's pixels
        asset(21L).payload)).toDF()
    StreamingImages.processBatch(store, b2)
    val after = acceptedIds(store)
    assert(after == (0L until 10L).toSet ++ Set(200L, 202L),
      s"got $after")
    // index band rows track the accepted set exactly
    val idxIds = IndexStore.read(store, spark, "phash")
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(idxIds == after)
  }

  test("a corrupt payload in a batch is rejected (never accepted, " +
      "never kills the gate) while valid assets dedup normally") {
    import spark.implicits._
    val store = new GraftStore(tempDir("graft-simg-corrupt"))
    val garbage = ImageDedupOps.ImageAsset(999L,
      Array.fill[Byte](80)(0x11))
    val b = (assets.filter(_.asset_id < 4) :+ garbage).toDF()
    StreamingImages.processBatch(store, b)
    assert(acceptedIds(store) == (0L until 4L).toSet,
      s"corrupt asset must fail curation: ${acceptedIds(store)}")
  }

  test("an ALL-corrupt batch commits nothing — no accepted rows, no " +
      "index rows, no snapshot; the stats now SEE the drop (r16 audit " +
      "blind spot: assets with zero hash rows were invisible)") {
    import spark.implicits._
    val store = new GraftStore(tempDir("graft-simg-allcorrupt"))
    val snap0 = store.currentSnapshot()
    val garbage = (0 until 3).map(i =>
      ImageDedupOps.ImageAsset(900L + i, Array.fill[Byte](48)((i + 1).toByte)))
    val stats = StreamingImages
      .processBatch(store, garbage.toDF(), collectStats = true).get
    assert(stats.survivors == 0 && stats.batchAssets == 3 &&
      stats.undecodedDropped == 3,
      s"undecodable assets must be counted from the raw batch: $stats")
    assert(store.currentSnapshot() == snap0,
      "an all-corrupt batch must not commit")
  }

  test("the epoch cursor skips a replayed batchId WITHOUT re-decoding " +
      "(runToAccepted path), leaves the cursor unmoved on an " +
      "all-dropped epoch, and advances it per committing epoch") {
    import spark.implicits._
    val store = new GraftStore(tempDir("graft-simg-epoch"))
    val b = assets.filter(_.asset_id < 4).toDF()
    StreamingImages.processBatch(store, b, batchId = Some(0L))
    val cursor = () => store.currentMeta()
      .get(store.metaKey("gate_batch_id_phash")) // pins the key literal
    assert(cursor().contains("0"))
    val snap1 = store.currentSnapshot()
    // replayed epoch: skipped outright — None even with stats on (the
    // skip happens before the decode pass)
    assert(StreamingImages
      .processBatch(store, b, collectStats = true, batchId = Some(0L))
      .isEmpty)
    assert(store.currentSnapshot() == snap1)
    // epoch 1 re-delivers the same assets under the SAME ids but a new
    // epoch: the gates drop them all (self-match), nothing commits,
    // cursor stays
    StreamingImages.processBatch(store, b, batchId = Some(1L))
    assert(cursor().contains("0") && store.currentSnapshot() == snap1)
    // epoch 2 with fresh assets commits and advances the cursor
    StreamingImages.processBatch(store,
      assets.filter(a => a.asset_id >= 4 && a.asset_id < 6).toDF(),
      batchId = Some(2L))
    assert(cursor().contains("2"))
    assert(acceptedIds(store) == (0L until 6L).toSet)
  }

  test("PINNED CONSTRAINT, not a bug: ONE cursor lineage per (store, " +
      "kind) — a second writer under a fresh epoch numbering is " +
      "silently skipped once the cursor passed its epochs (the " +
      "documented single-writer assumption, PerceptualGate.batchIdKey; " +
      "resume the original checkpoint or drive without a batchId)") {
    import spark.implicits._
    val store = new GraftStore(tempDir("graft-simg-twowriters"))
    // writer A's lineage has advanced the cursor to epoch 2
    StreamingImages.processBatch(store,
      assets.filter(_.asset_id < 2).toDF(), batchId = Some(2L))
    assert(acceptedIds(store) == Set(0L, 1L))
    // writer B: a NEW stream over the same store under a FRESH
    // checkpoint directory — foreachBatch epochs restart at 0. Its
    // batch holds GENUINELY NEW assets, yet the cursor makes epoch 0
    // look like a replay: the batch is dropped unprocessed. This is
    // the failure mode the documented assumption exists to forbid.
    val freshAssets = assets
      .filter(a => a.asset_id >= 2 && a.asset_id < 4).toDF()
    assert(StreamingImages.processBatch(store, freshAssets,
      collectStats = true, batchId = Some(0L)).isEmpty)
    assert(acceptedIds(store) == Set(0L, 1L),
      "a second lineage's early epochs are skipped BY DESIGN — if this " +
        "ever processes, the cursor semantics changed and the " +
        "single-writer doc must change with it")
    // the documented escape hatch for a genuinely-new driver: no
    // batchId — the content self-match layer gates instead
    StreamingImages.processBatch(store, freshAssets)
    assert(acceptedIds(store) == (0L until 4L).toSet)
  }

  test("a replayed micro-batch commits nothing (exactly-once)") {
    import spark.implicits._
    val store = new GraftStore(tempDir("graft-simg-replay"))
    val batch = assets.filter(_.asset_id < 8).toDF()
    StreamingImages.processBatch(store, batch)
    val snap1 = store.currentSnapshot()
    assert(acceptedIds(store) == (0L until 8L).toSet)
    StreamingImages.processBatch(store, batch)
    assert(store.currentSnapshot() == snap1,
      "replay committed a new snapshot")
    assert(acceptedIds(store) == (0L until 8L).toSet)
  }

  test("end-to-end stream: two micro-batches through runToAccepted — " +
      "cross-batch planted transforms drop, survivors accepted once") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val store = new GraftStore(tempDir("graft-simg-e2e"))
    val ckpt = tempDir("graft-simg-ckpt")
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Byte])]
    val q = StreamingImages.runToAccepted(
      mem.toDF().toDF("asset_id", "payload"), store, ckpt)
    // batch 1: bases 0..5; batch 2: their +2000 brightness variants
    // (d = 0 against history -> all drop) plus fresh base 6
    mem.addData((0 until 6).map(i => (i.toLong, asset(i.toLong).payload)))
    q.processAllAvailable()
    mem.addData((0 until 6).map(i =>
      (500L + i, asset(i + 2000L).payload)) :+ (6L, asset(6L).payload))
    q.processAllAvailable()
    q.stop()
    assert(acceptedIds(store) == (0L until 7L).toSet,
      s"got ${acceptedIds(store)}")
  }
}
