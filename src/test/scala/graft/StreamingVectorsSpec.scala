package graft

import graft.store.{GraftStore, IndexStore}
import graft.streaming.StreamingVectors
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming vector ingest over the `vec` index: per-batch gates
  * (intra-batch + cross-batch near-identical dedup), atomic
  * vectors+index commits, exactly-once replay, restart resumption —
  * the [[StreamingVectors]] analogue of StreamingCurationSpec. */
class StreamingVectorsSpec extends AnyFunSuite with BeforeAndAfterAll
    with TempDirCleanup {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  private val dim = 12
  private val rnd = new scala.util.Random(17)

  /** Distinct-direction vectors: pairwise cosine far below 0.99. */
  private def fresh(id: Long): (Long, Seq[Float]) =
    (id, Seq.fill(dim)(rnd.nextGaussian().toFloat))

  private def scaled(v: Seq[Float], f: Float): Seq[Float] = v.map(_ * f)

  private def acceptedIds(store: GraftStore): Set[Long] =
    StreamingVectors.accepted(spark, store)
      .select("vec_id").collect().map(_.getLong(0)).toSet

  test("gates compose: intra-batch and cross-batch near-dups drop, " +
      "accepted set and index stay in lockstep") {
    import spark.implicits._
    val store = new GraftStore(tempDir("graft-svec"))
    val base = (0L until 40L).map(fresh)
    StreamingVectors.processBatch(store, base.toDF("vec_id", "embedding"))
    assert(acceptedIds(store) == (0L until 40L).toSet)

    // batch 2: two fresh, one intra-batch dup pair (200, 201 — the
    // larger id loses), three cross-batch dups of already-accepted
    // vectors
    val shared = Seq.fill(dim)(rnd.nextGaussian().toFloat)
    val batch2 = Seq(fresh(100L), fresh(101L),
      (200L, shared), (201L, scaled(shared, 1.001f))) ++
      Seq(5L, 6L, 7L).map(i => (1000L + i, scaled(base(i.toInt)._2, 1.002f)))
    StreamingVectors.processBatch(store,
      batch2.toDF("vec_id", "embedding"))
    val after = acceptedIds(store)
    assert(after == (0L until 40L).toSet ++ Set(100L, 101L, 200L),
      s"got $after")
    // index rows track the accepted set exactly
    val idxIds = IndexStore.read(store, spark, "vec")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(idxIds == after)
  }

  test("a replayed micro-batch commits nothing (exactly-once)") {
    import spark.implicits._
    val store = new GraftStore(tempDir("graft-svec-replay"))
    val batch = (0L until 20L).map(fresh)
    StreamingVectors.processBatch(store, batch.toDF("vec_id", "embedding"))
    val snap1 = store.currentSnapshot()
    assert(acceptedIds(store) == (0L until 20L).toSet)
    // foreachBatch replay: identical batch, fresh store instance (the
    // process-restart story) — every vector self-matches at cosine 1
    StreamingVectors.processBatch(new GraftStore(store.root),
      batch.toDF("vec_id", "embedding"))
    val s2 = new GraftStore(store.root)
    assert(acceptedIds(s2) == (0L until 20L).toSet)
    assert(s2.currentSnapshot() == snap1, "replay committed a snapshot")
  }

  test("the epoch cursor skips a replayed batchId in O(1) — before any " +
      "scan (runToAccepted path) — leaves the cursor unmoved on an " +
      "all-dropped epoch, and advances it per committing epoch") {
    import spark.implicits._
    val store = new GraftStore(tempDir("graft-svec-epoch"))
    val b = (0L until 4L).map(fresh).toDF("vec_id", "embedding")
    StreamingVectors.processBatch(store, b, batchId = Some(0L))
    val cursor = () => store.currentMeta()
      .get(store.metaKey("gate_batch_id_vec")) // pins the key literal
    assert(cursor().contains("0"))
    val snap1 = store.currentSnapshot()
    // replayed epoch: skipped outright — None even with stats on (the
    // skip happens before the normalize scan, pair joins, and probe)
    assert(StreamingVectors
      .processBatch(store, b, collectStats = true, batchId = Some(0L))
      .isEmpty)
    assert(store.currentSnapshot() == snap1)
    // epoch 1 re-delivers the same vectors under the SAME ids but a new
    // epoch: all self-match at cosine 1, nothing commits, cursor stays
    StreamingVectors.processBatch(store, b, batchId = Some(1L))
    assert(cursor().contains("0") && store.currentSnapshot() == snap1)
    // epoch 2 with fresh vectors commits and advances the cursor
    StreamingVectors.processBatch(store,
      (10L until 12L).map(fresh).toDF("vec_id", "embedding"),
      batchId = Some(2L))
    assert(cursor().contains("2"))
    assert(acceptedIds(store) == (0L until 4L).toSet ++ Set(10L, 11L))
  }

  test("gate stats: one planted drop per counter — invalid (null and " +
      "zero-norm), same-direction, boundary (Hamming-1 split), cross, " +
      "and the survivors") {
    import spark.implicits._
    val store = new GraftStore(tempDir("graft-svec-stats"))
    val base = (0L until 5L).map(fresh)
    StreamingVectors.processBatch(store,
      base.toDF("vec_id", "embedding"))
    // a direction with one near-zero leading component, and its twin
    // with that component's SIGN flipped — cosine ~1 but the 16-bit
    // sign keys differ in exactly bit 1 (the boundary join's case)
    val tail = Seq.fill(dim - 1)(rnd.nextGaussian().toFloat)
    val sharedDir = Seq.fill(dim)(rnd.nextGaussian().toFloat)
    val batch = Seq(
      fresh(100L),                               // survivor
      (200L, sharedDir),                         // same-dir pair: keeper
      (201L, scaled(sharedDir, 1.001f)),         //   larger id drops
      (300L, 0.001f +: tail),                    // boundary pair: keeper
      (301L, -0.001f +: tail),                   //   larger id drops
      (400L, scaled(base(0)._2, 1.002f)),        // cross dup of vec 0
      (998L, null.asInstanceOf[Seq[Float]]),     // invalid: null
      (999L, Seq.fill(dim)(0f)))                 // invalid: zero-norm
    val stats = StreamingVectors.processBatch(store,
      batch.toDF("vec_id", "embedding"), collectStats = true).get
    assert(stats == StreamingVectors.VecGateStats(
      batchVecs = 8, invalidDropped = 2, sameDirDropped = 1,
      boundaryDropped = 1, crossDropped = 1, survivors = 3), s"$stats")
    assert(acceptedIds(store) ==
      (0L until 5L).toSet ++ Set(100L, 200L, 300L))
  }

  test("probe prunes: a one-vector batch against a grown index LISTS " +
      "few leaves (content-keyed buckets)") {
    import spark.implicits._
    val store = new GraftStore(tempDir("graft-svec-prune"))
    val base = (0L until 300L).map(fresh)
    StreamingVectors.processBatch(store, base.toDF("vec_id", "embedding"))
    val all = store.leavesOf("vec_index").size
    // the probe path: IndexStore.search reads through prunedIndex — a
    // single-vector batch touches exactly its own sign bucket's leaf
    val probe = Seq((9000L, scaled(base(3)._2, 1.001f)))
      .toDF("vec_id", "embedding")
    val hits = IndexStore.search(store, spark, "vec", probe,
      StreamingVectors.DupCos).collect()
    assert(hits.length == 1 && hits.head.getLong(1) == 3L)
    assert(hits.head.getLong(2) >= 9900L) // cos_bp of a 1.001x copy
    assert(all > 4, s"index too small to demonstrate pruning ($all leaves)")
  }

  test("at-least-once delivery converges: stale replays and partially " +
      "overlapping batches never double-accept or double-commit") {
    import spark.implicits._
    val store = new GraftStore(tempDir("graft-svec-ooo"))
    val a = (1L to 3L).map(fresh)
    val b = (11L to 12L).map(fresh)
    StreamingVectors.processBatch(store, a.toDF("vec_id", "embedding"))
    StreamingVectors.processBatch(store, b.toDF("vec_id", "embedding"))
    // STALE replay of a after b landed: each vector self-matches its
    // ORIGINAL run's index rows (the index keeps all history)
    StreamingVectors.processBatch(store, a.toDF("vec_id", "embedding"))
    // partial overlap: one replayed b vector, one near-copy of an a
    // vector under a NEW id, one genuinely new vector — only the new
    // one may land
    val mixed = Seq(b.head, (21L, scaled(a.head._2, 1.004f)), fresh(31L))
    StreamingVectors.processBatch(store, mixed.toDF("vec_id", "embedding"))
    val rows = StreamingVectors.accepted(spark, store)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(rows.size == rows.distinct.size,
      s"double-committed vec_ids: ${rows.diff(rows.distinct)}")
    assert(rows.sorted == Seq(1L, 2L, 3L, 11L, 12L, 31L),
      s"unexpected accepted set: ${rows.sorted}")
  }

  test("an empty micro-batch commits nothing") {
    import spark.implicits._
    val store = new GraftStore(tempDir("graft-svec-empty"))
    StreamingVectors.processBatch(store,
      (0L until 5L).map(fresh).toDF("vec_id", "embedding"))
    val snap = store.currentSnapshot()
    StreamingVectors.processBatch(store,
      Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding"))
    assert(store.currentSnapshot() == snap,
      "empty batch committed a snapshot")
  }

  test("randomized delivery sweep: accepted sets are in-bucket dup-free, " +
      "exact groups keep a witness, and batching is deterministic") {
    import spark.implicits._
    val sweep = new scala.util.Random(2718)
    for (trial <- 1 to 4) {
      val nGroups = 3 + sweep.nextInt(3)
      // exact-direction dup groups (positive scaling preserves both the
      // sign bucket and cosine 1) + isolated distinct vectors
      val groups = (0 until nGroups).map { g =>
        val v = Seq.fill(dim)(sweep.nextGaussian().toFloat)
        (0 until 2 + sweep.nextInt(3)).map(j =>
          (g * 100L + j, scaled(v, 1.0f + 0.001f * j)))
      }
      val singles = (1000L until 1000L + 5 + sweep.nextInt(10)).map(fresh)
      val corpus = sweep.shuffle(groups.flatten ++ singles)
      // random batching: 1-4 cuts
      val nBatches = 1 + sweep.nextInt(4)
      val batches = corpus.grouped(
        math.max(1, corpus.size / nBatches)).toSeq
      def runThrough(): Set[Long] = {
        val store = new GraftStore(tempDir(s"graft-svec-sweep$trial"))
        batches.foreach(b =>
          StreamingVectors.processBatch(store, b.toDF("vec_id", "embedding")))
        acceptedIds(store)
      }
      val acc = runThrough()
      assert(runThrough() == acc, s"trial $trial: batching nondeterministic")
      // 1. accepted set is in-bucket pairwise below the dup threshold
      val unitOf = corpus.map { case (id, v) =>
        val n = math.sqrt(v.map(x => x.toDouble * x).sum)
        id -> v.map(_ / n)
      }.toMap
      def cos(a: Long, b: Long): Double =
        unitOf(a).zip(unitOf(b)).map { case (x, y) => x * y }.sum
      def bucket(id: Long): Long = unitOf(id).take(16)
        .foldLeft(0L)((acc2, x) => acc2 * 2 + (if (x >= 0) 1 else 0))
      val accSeq = acc.toSeq
      for {
        i <- accSeq.indices; j <- i + 1 until accSeq.size
        if bucket(accSeq(i)) == bucket(accSeq(j))
      } assert(cos(accSeq(i), accSeq(j)) < StreamingVectors.DupCos,
        s"trial $trial: accepted in-bucket dup pair " +
          s"(${accSeq(i)}, ${accSeq(j)})")
      // 2. every exact-direction group has a within-threshold witness
      // among the accepted (its members share every sign bit, so the
      // witness argument survives the greedy chain)
      groups.foreach { g =>
        val rep = g.head._1
        assert(acc.exists(a => cos(a, rep) >= StreamingVectors.DupCos),
          s"trial $trial: group of ${g.map(_._1)} lost every witness")
      }
    }
  }

  test("end-to-end stream: accepted set equals the batch-dedup result") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new GraftStore(tempDir("graft-svec-e2e"))
    val a = (0L until 25L).map(fresh)
    val b = (100L until 110L).map(fresh) ++
      Seq(2L, 4L).map(i => (2000L + i, scaled(a(i.toInt)._2, 1.003f)))
    val incoming = MemoryStream[(Long, Seq[Float])]
    val q = StreamingVectors.runToAccepted(
      incoming.toDF().toDF("vec_id", "embedding"), store,
      tempDir("graft-svec-ckpt"))
    incoming.addData(a)
    q.processAllAvailable()
    incoming.addData(b)
    q.processAllAvailable()
    q.stop()
    assert(acceptedIds(store) ==
      (0L until 25L).toSet ++ (100L until 110L).toSet)
  }

  test("planted cross-boundary pairs: a near-identical twin split by " +
      "one sign bit is caught intra-batch AND cross-batch (multi-probe)") {
    import spark.implicits._
    // twin differs ONLY in the sign of one tiny component: cosine
    // 1−2ε² ≈ 0.9998 ≥ 0.99, but the fixed 16-bit sign keys differ in
    // that bit — the exact pair the single-bucket join missed before
    // the Hamming-1 multi-probe (round-13, VERDICT r12 next #4)
    def withTiny(id: Long, j: Int, eps: Float): (Long, Seq[Float]) = {
      val v = fresh(id)._2
      (id, v.updated(j, eps))
    }
    for (j <- Seq(0, 5, 11)) { // boundary dim at key start/middle/end
      val store = new GraftStore(tempDir(s"graft-svec-boundary-$j"))
      val (idA, vA) = withTiny(10L + j, j, 0.01f)
      val twinSame = (500L + j, vA.updated(j, -0.01f))
      // same batch: larger id loses via the flipped-bucket pair join
      StreamingVectors.processBatch(store,
        (Seq((idA, vA), twinSame) ++ (800L until 805L).map(fresh))
          .toDF("vec_id", "embedding"))
      assert(acceptedIds(store).contains(idA))
      assert(!acceptedIds(store).contains(twinSame._1),
        s"dim $j: same-batch boundary twin survived")
      // later batch: the twin probes the at-rest index through its
      // flipped bucket and drops
      val twinLater = (900L + j, vA.updated(j, -0.011f))
      StreamingVectors.processBatch(store,
        Seq(twinLater).toDF("vec_id", "embedding"))
      assert(!acceptedIds(store).contains(twinLater._1),
        s"dim $j: cross-batch boundary twin survived")
    }
  }

  test("a one-direction burst stays cap-bounded: the intra-batch pair " +
      "join uses the capped bucket, not the raw 16-bit key") {
    import spark.implicits._
    // 60 copies of one direction in a single micro-batch (the spam
    // burst): greedy drop keeps exactly the smallest id. Behavioral
    // gate for the capped-bucket intra join: identically-directed
    // vectors share every sign bit, so the cap's sub-splitting can
    // never separate them — the burst must still collapse to one
    // survivor through normalizedWithCappedBucket's key
    val store = new GraftStore(tempDir("graft-svec-burst"))
    val dirv = fresh(9999L)._2
    val burst = (0L until 60L).map(i =>
      (3000L + i, scaled(dirv, 1.0f + 0.0001f * i)))
    StreamingVectors.processBatch(store,
      (burst ++ (4000L until 4005L).map(fresh)).toDF("vec_id", "embedding"))
    val got = acceptedIds(store)
    assert(got.filter(_ >= 3000L).filter(_ < 4000L) == Set(3000L),
      s"burst not collapsed to its smallest id: ${got.filter(_ < 4000L)}")
    assert((4000L until 4005L).forall(got.contains))
  }

  test("no row escapes the gate's pair join: an over-cap sign-identical " +
      "pileup stays WHOLE under truncate=false (vs the batch cap's " +
      "lossy truncation)") {
    import spark.implicits._
    // 20 identically-directed vectors against cap=4, maxBits=20: the
    // cap can never sub-split them (identical signs), so the batch
    // operators' policy would hash-truncate 16 rows OUT of the pair
    // join — for the streaming gate those rows would skip intra-batch
    // dedup and COMMIT duplicates permanently. truncate=false keeps
    // the bucket whole: every row is present exactly once, all in ONE
    // final bucket.
    val dirv = Seq.fill(12)(rnd.nextGaussian().toFloat)
    val rows = graft.operators.DedupOps.normalizedWithBucket(
      (0L until 20L).map(i => (i, dirv.map(x => x * (1.0f + 0.001f * i))))
        .toDF("vec_id", "embedding"))
    val kept = graft.operators.DedupOps.cappedFromBucketed(
      rows, "vec_id", cap = 4, step = 4, maxBits = 24,
      truncate = false)
      .select("vec_id", "bucket").collect()
    assert(kept.length == 20, s"rows escaped: ${kept.length}/20")
    assert(kept.map(_.getLong(1)).distinct.length == 1,
      "sign-identical rows split across buckets")
    // and the default (batch) policy really is lossy here — pinning the
    // CONTRAST so a silent default flip gets caught
    val truncated = graft.operators.DedupOps.cappedFromBucketed(
      rows, "vec_id", cap = 4, step = 4, maxBits = 24)
      .count()
    assert(truncated == 4L, s"expected cap-truncated 4, got $truncated")
  }

  test("scoped filtered ingest: attrs ride into the streamed index, " +
      "cross-label twins both survive when scoped, same-label dups " +
      "drop intra- AND cross-batch, and filtered search works after " +
      "streaming") {
    import spark.implicits._
    val store = new GraftStore(tempDir("graft-svec-scoped"))
    val scope = Seq("label")
    // batch 1: a near-identical pair SPLIT ACROSS LABELS (both must
    // survive under scoping) and a same-label near-identical pair (the
    // larger id must drop), plus fresh fillers in each label
    val twin = Seq.fill(dim)(rnd.nextGaussian().toFloat)
    val samePair = Seq.fill(dim)(rnd.nextGaussian().toFloat)
    val b1 = Seq(
      (10L, twin, 0L), (11L, scaled(twin, 1.001f), 1L),
      (20L, samePair, 0L), (21L, scaled(samePair, 1.001f), 0L)) ++
      (30L until 40L).map(i => (i, fresh(i)._2, i % 2))
    StreamingVectors.processBatch(store,
      b1.toDF("vec_id", "embedding", "label"), scopeCols = scope)
    val after1 = acceptedIds(store)
    assert(after1.contains(10L) && after1.contains(11L),
      s"cross-label twins must BOTH survive under scoping: $after1")
    assert(after1.contains(20L) && !after1.contains(21L),
      s"same-label near-dup must drop: $after1")
    // batch 2 (cross-batch): a twin of vec 10 in label 0 drops; a twin
    // of vec 10 in label 2 (a label with no near neighbors) survives
    val b2 = Seq(
      (100L, scaled(twin, 1.002f), 0L),
      (101L, scaled(twin, 1.002f), 2L))
    StreamingVectors.processBatch(store,
      b2.toDF("vec_id", "embedding", "label"), scopeCols = scope)
    val after2 = acceptedIds(store)
    assert(!after2.contains(100L),
      s"same-label cross-batch dup must drop: $after2")
    assert(after2.contains(101L),
      s"new-label twin must survive the scoped cross-batch probe: " +
        s"$after2")
    // attrs are at rest in the streamed index: filtered search (the
    // index search --filter path) sees label-0 twins only
    val probe = Seq((9000L, scaled(twin, 1.0005f)))
      .toDF("vec_id", "embedding")
    val hits0 = IndexStore.search(store, spark, "vec", probe,
      StreamingVectors.DupCos, Some(col("label") === 0L))
      .select("existing_id").collect().map(_.getLong(0)).toSet
    assert(hits0 == Set(10L),
      s"label-0 filtered search must hit exactly vec 10: $hits0")
    val hits1 = IndexStore.search(store, spark, "vec", probe,
      StreamingVectors.DupCos, Some(col("label") === 1L))
      .select("existing_id").collect().map(_.getLong(0)).toSet
    assert(hits1 == Set(11L),
      s"label-1 filtered search must hit exactly vec 11: $hits1")
    // accepted table carries the attribute too
    val lbl = StreamingVectors.accepted(spark, store)
      .filter(col("vec_id") === 11L).select("label").head().getLong(0)
    assert(lbl == 1L)
  }

  test("a NULL scope value is a scope of its own, not a silent " +
      "opt-out: null-scope dups drop intra- and cross-batch, and a " +
      "labeled twin of a null-scope vector survives") {
    import spark.implicits._
    val store = new GraftStore(tempDir("graft-svec-nullscope"))
    val scope = Seq("label")
    val twin = Seq.fill(dim)(rnd.nextGaussian().toFloat)
    // batch 1: a null-scope near-identical pair (larger id must DROP —
    // the pre-fix behavior let both commit because null join keys fell
    // out of the pair joins), a labeled twin of the same direction
    // (different scope — survives), and null-scope fillers
    val b1 = Seq(
      (1L, twin, Option.empty[Long]),
      (2L, scaled(twin, 1.001f), Option.empty[Long]),
      (3L, scaled(twin, 1.002f), Some(0L))) ++
      (10L until 14L).map(i => (i, fresh(i)._2, Option.empty[Long]))
    StreamingVectors.processBatch(store,
      b1.toDF("vec_id", "embedding", "label"), scopeCols = scope)
    val after1 = acceptedIds(store)
    assert(after1.contains(1L) && !after1.contains(2L),
      s"null-scope intra-batch dup must drop the larger id: $after1")
    assert(after1.contains(3L),
      s"labeled twin of a null-scope vector must survive: $after1")
    // batch 2 (cross-batch): a null-scope twin of vec 1 must drop via
    // the null-scope probe (plain === would match nothing and commit
    // it); a twin under a brand-new label survives
    val b2 = Seq(
      (100L, scaled(twin, 1.003f), Option.empty[Long]),
      (101L, scaled(twin, 1.003f), Some(5L)))
    StreamingVectors.processBatch(store,
      b2.toDF("vec_id", "embedding", "label"), scopeCols = scope)
    val after2 = acceptedIds(store)
    assert(!after2.contains(100L),
      s"null-scope cross-batch dup must drop: $after2")
    assert(after2.contains(101L),
      s"new-label twin must survive: $after2")
    // replay of the null-scope batch stays exactly-once
    val snap = store.currentSnapshot()
    StreamingVectors.processBatch(store,
      b2.toDF("vec_id", "embedding", "label"), scopeCols = scope)
    assert(store.currentSnapshot() == snap,
      "null-scope replay committed a new snapshot")
  }

  test("residual-miss contract, quantified: sign-split 0 and 1 " +
      "detected 100%, split >= 2 detected 0% (the single-flip " +
      "multi-probe trade as a pinned number)") {
    val rep = graft.operators.DedupOps
      .vecGateRecallReport(spark).collect()
      .map(r => r.getAs[Int]("split_bits") ->
        (r.getAs[Long]("planted"), r.getAs[Long]("detected"))).toMap
    assert(rep.keySet == Set(0, 1, 2, 3), rep.toString)
    assert(rep(0) == (25L, 25L), s"split 0: ${rep(0)}")
    assert(rep(1) == (25L, 25L), s"split 1: ${rep(1)}")
    // THE documented residual miss, as a number. If multi-probe ever
    // grows double-flips, these flip to detected — update the
    // StreamingVectors scaladoc citation alongside this pin.
    assert(rep(2) == (25L, 0L), s"split 2: ${rep(2)}")
    assert(rep(3) == (25L, 0L), s"split 3: ${rep(3)}")
  }

  test("scoped replay stays exactly-once: the same labeled batch " +
      "commits nothing the second time") {
    import spark.implicits._
    val store = new GraftStore(tempDir("graft-svec-scoped-replay"))
    val batch = (0L until 15L).map(i => (i, fresh(i)._2, i % 3))
    StreamingVectors.processBatch(store,
      batch.toDF("vec_id", "embedding", "label"),
      scopeCols = Seq("label"))
    val snap1 = store.currentSnapshot()
    assert(acceptedIds(store) == (0L until 15L).toSet)
    StreamingVectors.processBatch(store,
      batch.toDF("vec_id", "embedding", "label"),
      scopeCols = Seq("label"))
    assert(store.currentSnapshot() == snap1,
      "scoped replay committed a new snapshot")
    assert(acceptedIds(store) == (0L until 15L).toSet)
  }
}
