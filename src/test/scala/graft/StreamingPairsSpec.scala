package graft

import graft.operators.{ImageDedupOps, PairedDedupOps}
import graft.store.{GraftStore, IndexStore}
import graft.streaming.StreamingPairs
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming (image, caption) pair ingest under the conjunctive
  * policy: the discriminating image-dup-different-caption case must
  * COMMIT (the image-only gate would drop it), exact replay is
  * idempotent, and the epoch cursor skips replayed batches. */
class StreamingPairsSpec extends AnyFunSuite with BeforeAndAfterAll
    with TempDirCleanup {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  private lazy val assets =
    ImageDedupOps.imageAssets(ImageDedupOps.NumImages)
  private def img(id: Long): Array[Byte] =
    assets.find(_.asset_id == id).get.payload

  private def pairDf(rows: Seq[(Long, Array[Byte], String)]) = {
    import spark.implicits._
    rows.toDF("pair_id", "payload", "caption")
  }

  private def acceptedIds(store: GraftStore): Set[Long] =
    StreamingPairs.accepted(spark, store)
      .select("pair_id").collect().map(_.getLong(0)).toSet

  test("the conjunctive gate end-to-end: same image + same caption " +
      "drops, same image + DIFFERENT caption commits (intra and " +
      "cross batch), accepted rows and index rows stay in lockstep") {
    val store = new GraftStore(tempDir("graft-spair"))
    // batch 1: three independent samples
    StreamingPairs.processBatch(store, pairDf(Seq(
      (1L, img(0L), "a red boat on the lake"),
      (2L, img(5L), "snow covered mountain pass"),
      (3L, img(10L), "a cat asleep on a windowsill"))))
    assert(acceptedIds(store) == Set(1L, 2L, 3L))

    // batch 2, intra-batch: one fresh image under two captions — both
    // commit (different caption = different sample); the same image
    // re-encoded under a near-identical caption — drops against the
    // smaller id
    StreamingPairs.processBatch(store, pairDf(Seq(
      (10L, img(2L), "harbor boats at sunrise"),
      (11L, img(2L), "fishing fleet leaving the bay"),
      (12L, img(1002L), "harbor boats at sunrise today"))),
      collectStats = true) match {
      case Some(st) =>
        assert(st.intraDropped == 1L, st.toString)
        assert(st.survivors == 2L, st.toString)
      case None => fail("stats requested but not returned")
    }
    assert(acceptedIds(store) == Set(1L, 2L, 3L, 10L, 11L))

    // batch 3, cross-batch: a re-encode of ACCEPTED pair 1's image
    // under pair 1's caption drops; the SAME image under a genuinely
    // different caption commits — the discriminating case
    StreamingPairs.processBatch(store, pairDf(Seq(
      (20L, img(1000L), "a red boat on the lake"),
      (21L, img(1000L), "abandoned rowboat in winter fog"))))
    val after = acceptedIds(store)
    assert(after == Set(1L, 2L, 3L, 10L, 11L, 21L), s"got $after")

    // the phash index carries every accepted pair exactly
    val idxIds = IndexStore.read(store, spark, "phash")
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(idxIds == after)

    // at-rest report == the batch operator over the accepted corpus.
    // The accepted set holds TWO image-dup groups under different
    // captions (10/11 committed intra-batch, 1/21 cross-batch), so
    // the conjunctive report must be EMPTY on both paths — an
    // image-only at-rest report would flag both groups
    val atRest = IndexStore.pairDupes(store, spark)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchOver = PairedDedupOps.pairedNearDupPairs(
      StreamingPairs.accepted(spark, store))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(atRest == batchOver, s"at-rest $atRest vs batch $batchOver")
    assert(atRest.isEmpty,
      s"accepted image-dups carry different captions — none is a " +
        s"SAMPLE dup: $atRest")
  }

  test("id-less replay is idempotent by content self-match: the same " +
      "batch re-presented commits nothing (Hamming 0 + Jaccard 1)") {
    val store = new GraftStore(tempDir("graft-spair-replay"))
    val b = pairDf(Seq(
      (1L, img(0L), "a red boat on the lake"),
      (2L, img(5L), "snow covered mountain pass")))
    StreamingPairs.processBatch(store, b)
    val snap1 = store.currentSnapshot()
    StreamingPairs.processBatch(store, b) // content replay, fresh call
    assert(acceptedIds(store) == Set(1L, 2L))
    assert(store.currentSnapshot() == snap1,
      "an all-dropped replay must not commit a snapshot")
  }

  test("epoch cursor: a replayed batchId skips before the decode " +
      "pass; a fresh epoch still processes") {
    val store = new GraftStore(tempDir("graft-spair-cursor"))
    val b = pairDf(Seq((1L, img(0L), "a red boat on the lake")))
    assert(StreamingPairs.processBatch(store, b,
      collectStats = true, batchId = Some(0L)).nonEmpty)
    // replayed epoch: returns None (skipped), even with stats on
    assert(StreamingPairs.processBatch(store,
      pairDf(Seq((99L, img(3L), "anything"))), collectStats = true,
      batchId = Some(0L)).isEmpty)
    assert(acceptedIds(store) == Set(1L))
    // fresh epoch processes and advances the cursor
    assert(StreamingPairs.processBatch(store,
      pairDf(Seq((2L, img(5L), "snow covered mountain pass"))),
      collectStats = true, batchId = Some(1L)).nonEmpty)
    assert(acceptedIds(store) == Set(1L, 2L))
    assert(store.currentMeta()(store.metaKey(StreamingPairs.BatchIdKey))
      == "1")
  }

  test("short captions stay replay-safe: the gram kernel emits a " +
      "gram even below the gram width, so identical tiny captions " +
      "self-match at Jaccard 1") {
    val store = new GraftStore(tempDir("graft-spair-short"))
    val b = pairDf(Seq((1L, img(0L), "ok")))
    StreamingPairs.processBatch(store, b)
    StreamingPairs.processBatch(store, b)
    assert(acceptedIds(store) == Set(1L))
  }

  test("a corrupt payload is rejected without killing the gate and " +
      "shows up in undecodedDropped") {
    val store = new GraftStore(tempDir("graft-spair-corrupt"))
    val st = StreamingPairs.processBatch(store, pairDf(Seq(
      (1L, img(0L), "a red boat on the lake"),
      (2L, Array.fill[Byte](64)(0x2a), "garbage bytes"))),
      collectStats = true).get
    assert(st.undecodedDropped == 1L, st.toString)
    assert(acceptedIds(store) == Set(1L))
  }
}
