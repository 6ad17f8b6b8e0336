package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.store.GraftStore
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Kill-between-steps sweep over the store commit protocol. StoreSpec
  * covers concurrency races; this suite covers a writer DYING at each
  * point of the stage → publish sequence, asserting the two recovery
  * invariants the design promises:
  *
  *   1. readers stay on the old snapshot — an interrupted commit is
  *      never partially visible (no manifest line, no meta key, no leaf);
  *   2. recovery is automatic — the next writer commits normally (no
  *      sequence collision, no stale state) and vacuum physically
  *      reclaims every piece of crash debris without manual repair.
  *
  * The crash points, in protocol order (publish = snapshot body →
  * atomic move to snapshot-* → pointer body → atomic move to _current):
  *
  *   A. die after staging leaves, before commit;
  *   B. die mid-snapshot-body write (torn `_snaptmp-*`);
  *   C. die after the snapshot move, before the pointer write (complete
  *      but unreferenced higher-sequence snapshot);
  *   D. die after the pointer write, before the `_current` move
  *      (orphan `_current.tmp-*`);
  *   E. die between the meta merge and publish (nothing persisted —
  *      meta must be bitwise unchanged).
  *
  * A JVM can't kill itself mid-test, so each point is simulated by
  * performing exactly the protocol prefix the dying writer would have
  * completed — staging through the public API, then hand-writing the
  * files publish would have written, byte-for-byte in its formats. */
class CrashSpec extends AnyFunSuite with BeforeAndAfterAll
    with TempDirCleanup {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  private def rows(ids: Long*): DataFrame = {
    import spark.implicits._
    ids.map(i => (i, s"payload-$i")).toDF("k", "v")
  }

  private def stageOnly(store: GraftStore, ids: Long*): Seq[String] =
    store.stageKeyed("t", rows(ids: _*), pmod(col("k"), lit(4L)),
      Seq(col("k"))).map(_.dir)

  private def commitRows(store: GraftStore, ids: Long*): Unit =
    store.commit(store.stageKeyed("t", rows(ids: _*),
      pmod(col("k"), lit(4L)), Seq(col("k"))))

  private def liveKeys(root: String): Seq[Long] =
    new GraftStore(root).read(spark, "t")
      .select("k").collect().map(_.getLong(0)).sorted.toSeq

  /** Fresh root with one good commit (the "old snapshot" every crash
    * must leave readers on) and a meta key (the unchanged-meta gate). */
  private def seeded(prefix: String): (String, GraftStore) = {
    val root = tempDir(prefix)
    val store = new GraftStore(root)
    store.commit(store.stageKeyed("t", rows(0L, 1L),
      pmod(col("k"), lit(4L)), Seq(col("k"))), Nil, Map("tip" -> "1"))
    (root, store)
  }

  /** The recovery gate shared by every crash point: readers on the old
    * data and meta; a fresh-instance writer commits; vacuum leaves no
    * crash debris on disk; the final read sees old + recovery rows. */
  private def assertRecovers(root: String, orphanDirs: Seq[String]): Unit = {
    // invariant 1: the interrupted commit is invisible
    assert(liveKeys(root) == Seq(0L, 1L), "readers must stay on old snapshot")
    assert(new GraftStore(root).currentMeta() == Map("tip" -> "1"),
      "meta must be bitwise unchanged")
    // invariant 2a: the next writer needs no repair
    val rec = new GraftStore(root)
    commitRows(rec, 7L)
    assert(liveKeys(root) == Seq(0L, 1L, 7L), "recovery commit must land")
    // invariant 2b: vacuum reclaims every piece of debris
    rec.vacuum(keepSnapshots = 1, graceMs = 0L)
    orphanDirs.foreach(d => assert(!Files.exists(Paths.get(root, d)),
      s"orphan leaf $d must be reclaimed"))
    val leftovers = Files.list(Paths.get(root)).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    while (leftovers.hasNext) names += leftovers.next().getFileName.toString
    assert(!names.exists(n => n.startsWith("_current.tmp-") ||
      n.startsWith("_snaptmp-")), s"tmp debris must be reclaimed: $names")
    assert(names.count(n => n.startsWith("snapshot-")) == 1,
      s"only the live snapshot survives: $names")
    // and the store still reads after reclamation
    assert(liveKeys(root) == Seq(0L, 1L, 7L), "post-vacuum read")
  }

  test("A: die after stage, before commit") {
    val (root, store) = seeded("graft-crash-a")
    val orphans = stageOnly(store, 5L, 6L)
    assert(orphans.nonEmpty)
    assertRecovers(root, orphans)
  }

  test("B: die mid-snapshot-body write (torn _snaptmp)") {
    val (root, store) = seeded("graft-crash-b")
    val orphans = stageOnly(store, 5L, 6L)
    // a half-flushed body: one complete line, one truncated mid-field
    Files.write(Paths.get(root, "_snaptmp-deadbeef"),
      s"t\t1\t${orphans.head}\nt\t2".getBytes(StandardCharsets.UTF_8))
    assertRecovers(root, orphans)
  }

  test("C: die after snapshot move, before pointer write") {
    val (root, store) = seeded("graft-crash-c")
    val orphans = stageOnly(store, 5L, 6L)
    // the complete snapshot the dying writer moved into place — higher
    // sequence than the live one, publish's exact line format, never
    // referenced by _current
    val stray = "snapshot-00000000000000009999-deadbeef.txt"
    val live = store.currentLeaves()
    val body = (live ++ orphans.map(d => store.Leaf("t", 9L, d)))
      .map(l => s"${l.table}\t${l.bucket}\t${l.dir}").mkString("\n")
    Files.write(Paths.get(root, stray),
      body.getBytes(StandardCharsets.UTF_8))
    assert(new GraftStore(root).snapshots().last == stray)
    assertRecovers(root, orphans)
    assert(!Files.exists(Paths.get(root, stray)),
      "the stray snapshot must be vacuumed once a newer commit lands")
  }

  test("C-first-vacuum: a vacuum BEFORE any recovery commit keeps the " +
      "stray's leaves (conservative), then converges after the commit") {
    val (root, store) = seeded("graft-crash-c2")
    val orphans = stageOnly(store, 5L, 6L)
    val stray = "snapshot-00000000000000009999-deadbeef.txt"
    val body = orphans.map(d => s"t\t9\t$d").mkString("\n")
    Files.write(Paths.get(root, stray),
      body.getBytes(StandardCharsets.UTF_8))
    // vacuum with no newer commit: the stray is the highest-sequence
    // kept snapshot, so its leaves count as referenced — the leaves of a
    // commit that MIGHT be one atomic-move away from publishing must
    // not be deleted out from under it
    store.vacuum(keepSnapshots = 1, graceMs = 0L)
    orphans.foreach(d => assert(Files.exists(Paths.get(root, d)),
      "stray-referenced leaves survive a pre-recovery vacuum"))
    assert(liveKeys(root) == Seq(0L, 1L))
    assertRecovers(root, orphans)
  }

  test("D: die after pointer write, before _current move") {
    val (root, store) = seeded("graft-crash-d")
    val orphans = stageOnly(store, 5L, 6L)
    val stray = "snapshot-00000000000000009999-deadbeef.txt"
    Files.write(Paths.get(root, stray),
      orphans.map(d => s"t\t9\t$d").mkString("\n")
        .getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(root, "_current.tmp-deadbeef"),
      stray.getBytes(StandardCharsets.UTF_8))
    assertRecovers(root, orphans)
  }

  test("E: die between meta merge and publish — no meta key leaks") {
    val (root, store) = seeded("graft-crash-e")
    // the dying writer computed currentMeta() ++ Map("tip" -> "99") but
    // never reached publish: nothing is on disk, and a reader started
    // at any point must see the old value
    stageOnly(store, 5L)
    assert(new GraftStore(root).currentMeta() == Map("tip" -> "1"))
    // the recovery writer's own meta commit then wins cleanly
    val rec = new GraftStore(root)
    rec.commit(Nil, Nil, Map("tip" -> "2"))
    assert(new GraftStore(root).currentMeta() == Map("tip" -> "2"))
  }

  test("randomized crash/recovery interleavings: readers always see " +
      "exactly the committed keys, and recovery never needs repair") {
    // The fixed crash points above are the protocol's corners; this
    // sweep composes them randomly — crashed writers, successful
    // commits and vacuums interleaved — and checks the model-based
    // invariant after EVERY step: the store reads exactly the set of
    // keys successful commits produced, nothing more, nothing less.
    val rnd = new scala.util.Random(211)
    (0 until 3).foreach { trial =>
      val root = tempDir(s"graft-crash-rand$trial")
      val store = new GraftStore(root)
      var committed = Vector.empty[Long]
      var nextId = 0L
      def freshIds(n: Int): Seq[Long] = {
        val ids = (nextId until nextId + n); nextId += n; ids
      }
      // seed commit: the reader model needs a table to read
      commitRows(store, freshIds(2): _*)
      committed ++= Seq(0L, 1L)
      (0 until 12).foreach { step =>
        rnd.nextInt(6) match {
          case 0 | 1 => // a successful commit
            val ids = freshIds(1 + rnd.nextInt(3))
            commitRows(store, ids: _*)
            committed ++= ids
          case 2 => // crash A: stage, die
            stageOnly(store, freshIds(2): _*)
          case 3 => // crash B: torn snapshot body
            Files.write(Paths.get(root, f"_snaptmp-t$trial-s$step"),
              s"t\t1\torphan\nt\t2".getBytes(StandardCharsets.UTF_8))
          case 4 => // crash C/D: stray high-seq snapshot (+ pointer tmp)
            val orphans = stageOnly(store, freshIds(2): _*)
            val stray = f"snapshot-${8000 + step}%020d-t$trial" +
              f"s$step%02d.txt"
            Files.write(Paths.get(root, stray),
              orphans.map(d => s"t\t9\t$d").mkString("\n")
                .getBytes(StandardCharsets.UTF_8))
            if (rnd.nextBoolean())
              Files.write(Paths.get(root, s"_current.tmp-t$trial-s$step"),
                stray.getBytes(StandardCharsets.UTF_8))
          case 5 => // maintenance runs whenever
            store.vacuum(keepSnapshots = 1, graceMs = 0L)
        }
        assert(liveKeys(root) == committed.sorted,
          s"trial $trial step $step: reader sees wrong keys")
      }
      // final recovery: one commit + vacuum leaves a clean store
      commitRows(store, 9999L)
      committed :+= 9999L
      store.vacuum(keepSnapshots = 1, graceMs = 0L)
      assert(liveKeys(root) == committed.sorted)
      val names = Files.list(Paths.get(root)).iterator()
      val leftover = new scala.collection.mutable.ArrayBuffer[String]
      while (names.hasNext) leftover += names.next().getFileName.toString
      assert(!leftover.exists(n => n.startsWith("_current.tmp-") ||
        n.startsWith("_snaptmp-")), s"trial $trial debris: $leftover")
    }
  }

  test("repeated interrupted commits never poison the sequence counter") {
    val (root, store) = seeded("graft-crash-seq")
    // three successive crashed writers, each leaving a higher-seq stray
    (1 to 3).foreach { i =>
      Files.write(Paths.get(root, f"snapshot-${9000 + i}%020d-dead000$i.txt"),
        "t\t0\tbogus".getBytes(StandardCharsets.UTF_8))
    }
    commitRows(store, 7L)
    // the recovery commit minted a sequence above every stray: it is the
    // one _current references AND the newest in sequence order
    val cur = store.currentSnapshot().get
    assert(store.snapshots().last == cur,
      s"recovery snapshot must outrank strays: $cur")
    assert(liveKeys(root) == Seq(0L, 1L, 7L))
    store.vacuum(keepSnapshots = 1, graceMs = 0L)
    assert(store.snapshots() == Seq(cur), "strays vacuumed")
  }
}
