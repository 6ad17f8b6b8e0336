package graft


import graft.operators.DedupOps
import graft.streaming.StreamingCuration
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming curation end-to-end: a MemoryStream of document batches
  * driven through foreachBatch; each batch is quality-floored, deduped
  * within itself, deduped against everything accepted so far, and the
  * band index grows with the survivors — so a later batch's copy of an
  * earlier batch's doc is caught without re-shingling history. */
class StreamingCurationSpec extends AnyFunSuite with BeforeAndAfterAll
    with TempDirCleanup {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  private def corpus: DataFrame =
    Tables.t(spark, dir, "documents").select("doc_id", "text")

  private def textOf(id: Long): String =
    corpus.filter(col("doc_id") === id).head().getString(1)

  /** The batch-dedup perturbation: every 23rd token replaced. */
  private def nearCopy(text: String): String =
    text.split("\\s+").zipWithIndex
      .map { case (t, i) => if (i % 23 == 0) "xdupx" else t }
      .mkString(" ")

  test("foreachBatch curation: floor, intra-batch and cross-batch dedup") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // seed index: the historical corpus
    var index = DedupOps.buildBandIndex(corpus).localCheckpoint()
    val accepted = scala.collection.mutable.Map[Long, Long]()

    val incoming = MemoryStream[(Long, String)]
    val q = incoming.toDF().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (survivors, newRows) =
          StreamingCuration.curateBatch(batch, index)
        survivors.collect().foreach(r =>
          accepted += (r.getAs[Long]("doc_id") -> r.getAs[Long]("quality_bp")))
        index = index.unionByName(newRows).localCheckpoint()
        ()
      }
      .option("checkpointLocation",
        tempDir("graft-ckpt"))
      .start()

    // 80 distinct tokens, >500 chars: clears the quality floor (length +
    // token-window components) and gives the 5-shingle Jaccard a rich
    // set, so the 23-spaced perturbation lands at ~0.64 — a detectable
    // near-dup, same regime as the batch dedup queries
    val freshText = (1 to 80).map(i => f"galaxy$i%05d").mkString(" ")

    // batch 1: a fresh unique doc, a near-copy of corpus doc 11 (cross-
    // batch dup vs the seed index), and a low-quality stub
    incoming.addData(Seq(
      (500001L, freshText),
      (500002L, nearCopy(textOf(11L))),
      (500003L, "too short")))
    q.processAllAvailable()

    // batch 2: a near-copy of batch 1's accepted doc (caught only if the
    // index grew), an exact intra-batch pair, and their near-copy
    val other = (1 to 80).map(i => f"copper$i%05d").mkString(" ")
    incoming.addData(Seq(
      (600001L, nearCopy(freshText)),
      (600002L, other),
      (600003L, other),
      (600004L, nearCopy(other))))
    q.processAllAvailable()
    q.stop()

    assert(accepted.contains(500001L)) // fresh doc accepted
    assert(!accepted.contains(500002L)) // dup of history dropped
    assert(!accepted.contains(500003L)) // below the quality floor
    assert(!accepted.contains(600001L)) // dup of batch-1 survivor dropped
    assert(accepted.contains(600002L)) // first of the exact pair kept
    assert(!accepted.contains(600003L)) // exact dup dropped in-batch
    assert(!accepted.contains(600004L)) // near-dup dropped in-batch
    accepted.values.foreach(bp => assert(bp >= 3000L))
  }

  test("a replayed micro-batch commits nothing (exactly-once)") {
    import graft.streaming.StreamingCuration
    import spark.implicits._
    val root = tempPath("graft-stream-replay")
    val store = new graft.store.GraftStore(s"$root/store")
    val batch = Seq(
      (1L, (1 to 80).map(i => f"meadow$i%05d").mkString(" ")),
      (2L, (1 to 80).map(i => f"basalt$i%05d").mkString(" ")))
      .toDF("doc_id", "text")
    StreamingCuration.processBatch(store, batch)
    val read = () => store.read(spark, StreamingCuration.AcceptedTable)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val first = read()
    assert(first == Seq(1L, 2L))
    val snapBefore = store.currentLeaves().toSet
    // foreachBatch replay: the exact same batch delivered again — every
    // doc self-matches the index rows the first run committed, so the
    // replay accepts nothing and adds no leaves
    StreamingCuration.processBatch(store, batch)
    assert(read() == first)
    assert(store.currentLeaves().toSet == snapBefore)
  }

  test("at-least-once delivery converges: stale replays and partially " +
      "overlapping batches never double-accept or double-commit") {
    import spark.implicits._
    val root = tempPath("graft-stream-ooo")
    val store = new graft.store.GraftStore(s"$root/store")
    def doc(id: Long, word: String) =
      (id, (1 to 80).map(i => f"$word$id%03d$i%05d").mkString(" "))
    val a = Seq(doc(1L, "amber"), doc(2L, "bison"), doc(3L, "cedar"))
    val b = Seq(doc(11L, "delta"), doc(12L, "ember"))
    StreamingCuration.processBatch(store, a.toDF("doc_id", "text"))
    StreamingCuration.processBatch(store, b.toDF("doc_id", "text"))
    // a STALE replay: batch a again, though b has landed since — each doc
    // must self-match the index rows of its ORIGINAL run (the index keeps
    // all history, not just the last epoch)
    StreamingCuration.processBatch(store, a.toDF("doc_id", "text"))
    // partial overlap: one replayed b doc, one near-copy of an a doc
    // (every 23rd token swapped), one genuinely new doc — only the new
    // doc may land
    val nearA = doc(21L, "x")._1 -> a.head._2.split(" ").zipWithIndex
      .map { case (t, i) => if (i % 23 == 0) "xdupx" else t }.mkString(" ")
    val mixed = Seq(b.head, (21L, nearA._2), doc(31L, "fjord"))
    StreamingCuration.processBatch(store, mixed.toDF("doc_id", "text"))
    val rows = store.read(spark, StreamingCuration.AcceptedTable)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    // exactly-once per doc: no doc_id appears twice in the at-rest table
    assert(rows.size == rows.distinct.size,
      s"double-committed doc_ids: ${rows.diff(rows.distinct)}")
    assert(rows.sorted == Seq(1L, 2L, 3L, 11L, 12L, 31L),
      s"unexpected accepted set: ${rows.sorted}")
  }

  test("processBatch racing `index compact`: both commits land, and " +
      "exactly-once survives the leaf swap") {
    import spark.implicits._
    val root = tempPath("graft-stream-compact")
    val store = new graft.store.GraftStore(s"$root/store")
    def doc(id: Long, word: String) =
      (id, (1 to 80).map(i => f"$word$id%03d$i%05d").mkString(" "))
    val a = Seq(doc(1L, "amber"), doc(2L, "bison"))
    val b = Seq(doc(11L, "delta"), doc(12L, "ember"))
    StreamingCuration.processBatch(store, a.toDF("doc_id", "text"))
    StreamingCuration.processBatch(store, b.toDF("doc_id", "text"))
    // the racing batch: one new doc + one near-copy of an accepted doc.
    // Real threads, own store instance each — the maintenance regime
    // (periodic `index compact` scheduled next to a live curate stream).
    // Compact's commit swaps every band leaf; processBatch is adds-only,
    // so NEITHER side may fail stale: compact's drops stay live (the
    // stream never drops), and the stream's adds are not in compact's
    // drop set. The band rows the stream appends mid-compact just miss
    // this compaction round — the documented append-vs-compact contract.
    val c = Seq(doc(21L, "fjord"),
      (22L, a.head._2.split(" ").zipWithIndex.map { case (t, i) =>
        if (i % 23 == 0) "xdupx" else t }.mkString(" ")))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val start = new java.util.concurrent.CountDownLatch(1)
    val threads = Seq(
      new Thread(() => try {
        start.await()
        graft.store.IndexStore.compact(
          new graft.store.GraftStore(s"$root/store"), spark, "band")
        ()
      } catch { case t: Throwable => errs.add(t) }),
      new Thread(() => try {
        start.await()
        StreamingCuration.processBatch(
          new graft.store.GraftStore(s"$root/store"), c.toDF("doc_id", "text"))
      } catch { case t: Throwable => errs.add(t) }))
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join())
    assert(errs.isEmpty, s"race crashed: ${errs.peek()}")
    val read = () => store.read(spark, StreamingCuration.AcceptedTable)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // the new doc landed, the near-copy was caught against WHICHEVER index
    // snapshot the stream read (pre- or post-compact: compact only
    // collapses duplicates, so doc 1's band rows are in both)
    assert(read() == Seq(1L, 2L, 11L, 12L, 21L),
      s"accepted set wrong after race: ${read()}")
    // exactly-once across the swap: replaying every batch — including the
    // one that raced the compaction — commits nothing
    val snap = store.currentLeaves().toSet
    Seq(a, b, c).foreach(batch =>
      StreamingCuration.processBatch(store, batch.toDF("doc_id", "text")))
    assert(read() == Seq(1L, 2L, 11L, 12L, 21L))
    assert(store.currentLeaves().toSet == snap,
      "a replayed batch committed leaves after compaction")
  }

  test("streaming curate end-to-end writes the same shards as batch curate") {
    import graft.operators.{CorpusOps, CurationOps}
    import graft.streaming.StreamingCuration
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // corpus = the sf0.001 documents plus an injected exact copy and an
    // injected near copy (dup pairs, not chains — the regime where the
    // batch closure's keep-min-id and the streaming greedy drop agree)
    val base = corpus.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
    val injected = Seq(
      (900001L, textOf(7L)),           // exact copy of doc 7
      (900002L, nearCopy(textOf(23L))) // near copy of doc 23
    )
    val all = (base ++ injected).sortBy(_._1)

    // batch path: the curate verb's composition on the whole corpus
    val root = tempPath("graft-stream-e2e")
    val d = all.toSeq.toDF("doc_id", "text")
    val batchOut = s"$root/batch_shards"
    CorpusOps.writeShards(
      d.join(CurationOps.curateCorpus(d), "doc_id").select("doc_id", "text"),
      batchOut, 50L)

    // streaming path: same corpus in three id-ordered micro-batches
    // (earlier batches carry smaller ids, so the cross-batch probe drops
    // the later id of any pair — the batch path's min-id rule)
    val store = new graft.store.GraftStore(s"$root/store")
    val incoming = MemoryStream[(Long, String)]
    val q = StreamingCuration.runToAccepted(
      incoming.toDF().toDF("doc_id", "text"), store, s"$root/ckpt")
    all.grouped((all.size + 2) / 3).foreach { chunk =>
      incoming.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val streamOut = s"$root/stream_shards"
    // a FRESH store instance reads the manifest — the restart story
    StreamingCuration.exportShards(spark,
      new graft.store.GraftStore(s"$root/store"), streamOut, 50L)

    // identical shards: same (doc_id, shard, rank, text) everywhere
    // partitionBy-inferred `shard` reads back as int — normalize to long
    val read = (p: String) => spark.read.parquet(p)
      .selectExpr("doc_id", "CAST(shard AS BIGINT) AS shard",
        "shuffle_rank", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1) -> r.getLong(2),
        r.getString(3))).toSet
    val batchSet = read(batchOut)
    val streamSet = read(streamOut)
    assert(batchSet.nonEmpty)
    assert(streamSet == batchSet)
    // and the dups were actually dropped along the way
    val ids = streamSet.map(_._1)
    assert(!ids.contains(900001L) && !ids.contains(900002L))
    assert(ids.contains(7L) && ids.contains(23L))
  }

  test("exactSpans stage: a later batch's doc loses its " +
      "history-duplicated extent before the gates, a boilerplate-" +
      "heavy doc the whole-doc gates would PASS fails on its " +
      "remainder, and replay commits nothing") {
    import spark.implicits._
    import graft.store.GraftStore
    val store = new GraftStore(tempDir("graft-scur-espan"))
    val base = (1 to 80).map(i => f"orbit$i%05d").mkString(" ")
    StreamingCuration.processBatch(store,
      Seq((1L, base)).toDF("doc_id", "text"), exactSpans = true)
    def acceptedText: Map[Long, String] =
      store.read(spark, StreamingCuration.AcceptedTable)
        .select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(acceptedText.keySet == Set(1L))

    // doc 2: 60 fresh tokens + a verbatim 20-token run of doc 1 —
    // accepted WITHOUT the run (cut against the at-rest espan index)
    val run = base.split(" ").slice(10, 30).mkString(" ")
    val fresh = (1 to 60).map(i => f"nova$i%05d").mkString(" ")
    StreamingCuration.processBatch(store,
      Seq((2L, s"$fresh $run")).toDF("doc_id", "text"),
      exactSpans = true)
    assert(acceptedText.get(2L).contains(fresh),
      s"doc 2 must land with the duplicated extent cut: " +
        s"${acceptedText.get(2L)}")

    // replay of doc 2's batch: the probe excludes the batch's own
    // postings, cuts identically, and the whole-doc gate self-matches
    val snap = store.currentSnapshot()
    StreamingCuration.processBatch(store,
      Seq((2L, s"$fresh $run")).toDF("doc_id", "text"),
      exactSpans = true)
    assert(store.currentSnapshot() == snap,
      "replayed batch committed a new snapshot")

    // doc 3: a 31-token slice of doc 1 + a tiny tail — whole-doc
    // near-dup sits UNDER the 0.4 gate (jaccard ~0.34, the slice shape
    // whole-doc fingerprints miss), but after the span cut only the
    // tail remains and the quality floor drops it
    val slice31 = base.split(" ").slice(20, 51).mkString(" ")
    val doc3 = s"$slice31 small tail"
    StreamingCuration.processBatch(store,
      Seq((3L, doc3)).toDF("doc_id", "text"), exactSpans = true)
    assert(!acceptedText.contains(3L),
      s"boilerplate-heavy doc must fail on its remainder: " +
        s"${acceptedText.get(3L)}")
    // control: WITHOUT the stage the same doc sails through the
    // whole-doc gates — the span cut is what caught it
    val store2 = new GraftStore(tempDir("graft-scur-espan-ctl"))
    StreamingCuration.processBatch(store2,
      Seq((1L, base)).toDF("doc_id", "text"))
    StreamingCuration.processBatch(store2,
      Seq((3L, doc3)).toDF("doc_id", "text"))
    val ctl = store2.read(spark, StreamingCuration.AcceptedTable)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ctl.contains(3L),
      s"control: whole-doc gates alone were expected to pass doc 3 " +
        s"(got $ctl) — fixture no longer demonstrates the stage")
  }

  test("a 65+ distinct-near-dup text flood (the r16 `weak`): truncation " +
      "fires yet EVERY committed survivor keeps at-rest band rows, " +
      "replay commits nothing, and compact-then-replay commits nothing") {
    import spark.implicits._
    import graft.store.{GraftStore, IndexStore}
    val store = new GraftStore(tempDir("graft-scur-flood"))
    // 200 near-dup variants of one 80-token base (unique trailing token
    // each): mutually distinct texts whose signatures mostly agree, so
    // the base band buckets flood far past MaxBucketSize (64) — the
    // shape whose staged index rows the pre-r17 whole-group cap erased
    val base = (1 to 80).map(i => f"torrent$i%05d").mkString(" ")
    val flood = (0 until 200).map(i => (5000L + i, s"$base uniq$i%05d"))
    val floodDf = flood.toDF("doc_id", "text")
    // fixture: the flood must actually overflow at least one bucket
    val maxBucket = DedupOps.lshBands(DedupOps.minhashSignatures(floodDf))
      .groupBy("band", "band_key").count().agg(max("count"))
      .head().getLong(0)
    assert(maxBucket > DedupOps.MaxBucketSize,
      s"fixture: flood must overflow a band bucket, got max $maxBucket")
    val stats = StreamingCuration
      .processBatch(store, floodDf, collectStats = true).get
    assert(stats.survivors > 0, s"$stats")
    // the at-rest truncation FIRED (rows were capped out of hot
    // buckets) — and still every accepted doc keeps >= 1 band row,
    // which is exactly what the old whole-group drop violated
    assert(stats.cappedIndexRows > 0,
      s"fixture must exercise truncation: $stats")
    val acceptedIds = store.read(spark, StreamingCuration.AcceptedTable)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val liveIdx = () => IndexStore.read(store, spark, "band")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(acceptedIds.subsetOf(liveIdx()),
      s"survivors missing at-rest band rows: ${acceptedIds -- liveIdx()}")
    // replay: the ID backstop drops the whole batch deterministically —
    // no dependence on band self-match (whose probe side is capped and
    // would lose the flood's own buckets)
    val snap1 = store.currentSnapshot()
    val replay = StreamingCuration
      .processBatch(store, floodDf, collectStats = true).get
    assert(store.currentSnapshot() == snap1,
      "flood replay committed a new snapshot")
    // exactly the committed ids fall to the ID backstop; nothing survives
    assert(replay.replayDropped == stats.survivors &&
      replay.survivors == 0, s"$replay")
    // compact re-applies the global truncation: still no survivor loses
    // its last row, and a second replay still commits nothing
    IndexStore.compact(store, spark, "band")
    assert(acceptedIds.subsetOf(liveIdx()),
      "compact erased a committed survivor's last band row")
    val snap2 = store.currentSnapshot()
    StreamingCuration.processBatch(store, floodDf)
    assert(store.currentSnapshot() == snap2,
      "post-compact replay committed a new snapshot")
    // cross-batch: a fresh near-copy of the flood's min-id survivor
    // still drops (rank 1 in every bucket, so truncation kept ALL its
    // rows — the deterministic victim)
    val victim = flood.filter(f => acceptedIds.contains(f._1)).minBy(_._1)
    val nc = victim._2.split(" ").zipWithIndex
      .map { case (t, i) => if (i % 23 == 0) "xdupx" else t }.mkString(" ")
    StreamingCuration.processBatch(store,
      Seq((9000L, nc)).toDF("doc_id", "text"))
    assert(store.read(spark, StreamingCuration.AcceptedTable)
      .filter(col("doc_id") === 9000L).isEmpty,
      "near-copy of a flood survivor must drop cross-batch")
  }

  test("the epoch cursor (runToAccepted path): a replayed batchId is " +
      "skipped O(1) — even a 65+ same-bucket flood — an all-dropped " +
      "epoch leaves the cursor unmoved, and later epochs advance it") {
    import spark.implicits._
    import graft.store.GraftStore
    val store = new GraftStore(tempDir("graft-scur-epoch"))
    val base = (1 to 80).map(i => f"rapids$i%05d").mkString(" ")
    val flood = (0 until 70).map(i => (7000L + i, s"$base uniq$i%05d"))
      .toDF("doc_id", "text")
    StreamingCuration.processBatch(store, flood, batchId = Some(0L))
    val snap1 = store.currentSnapshot()
    val accepted1 = store.read(spark, StreamingCuration.AcceptedTable)
      .count()
    assert(accepted1 > 0)
    assert(store.currentMeta()(store.metaKey(
      StreamingCuration.BatchIdKey)) == "0")
    // replay of epoch 0: skipped outright — no commit, and None even
    // with stats requested (the skip never runs the gates)
    val replay = StreamingCuration.processBatch(store, flood,
      collectStats = true, batchId = Some(0L))
    assert(replay.isEmpty && store.currentSnapshot() == snap1,
      "replayed epoch must be skipped without committing")
    // epoch 1 all-dropped (below the quality floor): commits nothing,
    // cursor stays at 0, and ITS replay re-processes harmlessly
    val junk = Seq((8000L, "too short")).toDF("doc_id", "text")
    StreamingCuration.processBatch(store, junk, batchId = Some(1L))
    assert(store.currentMeta()(store.metaKey(
      StreamingCuration.BatchIdKey)) == "0")
    StreamingCuration.processBatch(store, junk, batchId = Some(1L))
    assert(store.currentSnapshot() == snap1)
    // epoch 2 with a fresh doc advances the cursor and commits
    val fresh = Seq((8001L,
      (1 to 80).map(i => f"lagoon$i%05d").mkString(" ")))
      .toDF("doc_id", "text")
    StreamingCuration.processBatch(store, fresh, batchId = Some(2L))
    assert(store.currentMeta()(store.metaKey(
      StreamingCuration.BatchIdKey)) == "2")
    assert(store.read(spark, StreamingCuration.AcceptedTable)
      .count() == accepted1 + 1)
  }

  test("CurateStats counters: one planted doc per drop class lands in " +
      "its counter (replay-id, quality, exact, intra, cross), in gate " +
      "order") {
    import spark.implicits._
    import graft.store.GraftStore
    val store = new GraftStore(tempDir("graft-scur-stats"))
    def mk(word: String) = (1 to 80).map(i => f"$word$i%05d").mkString(" ")
    // seed: doc 1 accepted
    StreamingCuration.processBatch(store,
      Seq((1L, mk("quartz"))).toDF("doc_id", "text"))
    val fresh = mk("zircon")
    val other = mk("gneiss")
    val batch = Seq(
      (1L, mk("quartz")),               // replayed id -> ID backstop
      (10L, "too short"),               // quality floor
      (11L, other), (12L, other),       // exact pair: 12 drops
      (13L, other.split(" ").zipWithIndex.map { case (t, i) =>
        if (i % 23 == 0) "xdupx" else t }.mkString(" ")), // intra near-dup
      (14L, mk("quartz").split(" ").zipWithIndex.map { case (t, i) =>
        if (i % 23 == 0) "xdupx" else t }.mkString(" ")), // cross near-dup
      (15L, fresh))                     // survivor
    val s = StreamingCuration
      .processBatch(store, batch.toDF("doc_id", "text"),
        collectStats = true).get
    assert(s == StreamingCuration.CurateStats(
      batchDocs = 7, replayDropped = 1, qualityDropped = 1,
      exactDropped = 1, intraDropped = 1, crossDropped = 1,
      survivors = 2, cappedIndexRows = 0), s"$s")
  }

  test("turning exactSpans ON over pre-existing accepted docs " +
      "BACKFILLS their espan postings first: extents duplicated from " +
      "pre-flag history are cut, not silently passed") {
    import spark.implicits._
    import graft.store.{GraftStore, IndexStore}
    val store = new GraftStore(tempDir("graft-scur-espan-bf"))
    val base = (1 to 80).map(i => f"comet$i%05d").mkString(" ")
    // doc 1 accepted BEFORE the flag: no espan postings at rest
    StreamingCuration.processBatch(store,
      Seq((1L, base)).toDF("doc_id", "text"))
    assert(store.leavesOf(IndexStore.tableOf("espan")).isEmpty,
      "fixture: pre-flag accept must not write espan postings")
    // first flagged batch: doc 2 carries a verbatim 20-token run of
    // the PRE-FLAG doc 1 — without the backfill this certified against
    // an empty index and the run sailed through uncut
    val run = base.split(" ").slice(30, 50).mkString(" ")
    val fresh = (1 to 60).map(i => f"pulsar$i%05d").mkString(" ")
    StreamingCuration.processBatch(store,
      Seq((2L, s"$fresh $run")).toDF("doc_id", "text"),
      exactSpans = true)
    val accepted = store.read(spark, StreamingCuration.AcceptedTable)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(accepted.get(2L).contains(fresh),
      s"the pre-flag history's extent must be cut after backfill: " +
        s"${accepted.get(2L)}")
    // the backfill landed doc 1's postings at rest (one-time build)
    val bf = IndexStore.read(store, spark, "espan")
      .filter(col("doc_id") === 1L).count()
    assert(bf > 0, "backfill must persist pre-flag docs' postings")
  }
}
