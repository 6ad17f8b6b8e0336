package graft

import graft.chain.{ChainFixture, ChainOps, TransferType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end chain pipeline over the 200-block fixture: decode+joins vs
  * golden, verify checks, maturity window, reorg rollback convergence
  * (SURVEY §5.2 items 3–5). */
class ChainOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  lazy val fx: ChainFixture.Fixture = ChainFixture.build(200)

  override def afterAll(): Unit = spark.stop()

  test("token-transfer pipeline output equals the independent golden") {
    val got = ChainOps.tokenTransfers(
        fx.txsDF(spark), fx.blocksDF(spark), fx.receiptsDF(spark))
      .select("block_number", "from_addr", "to_addr", "value", "tx_hash",
        "address", "transfer_index", "status")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getString(4), r.getString(5), r.getLong(6), r.getInt(7)))
      .toSet
    val want = fx.goldenTransfers.map { case (t, _) =>
      (t.block_number, t.from_addr, t.to_addr, t.value, t.tx_hash, t.address,
        t.transfer_index, t.status)
    }.toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("created_at is derived from block timestamp, not wall clock") {
    val row = ChainOps.tokenTransfers(fx.txsDF(spark), fx.blocksDF(spark),
        fx.receiptsDF(spark))
      .filter(col("block_number") === 10)
      .select(date_format(col("created_at"), "yyyy-MM-dd HH:mm:ss"))
      .head()
    // block 10 ts = 1700000000 + 100 = 2023-11-14 22:15:00 UTC
    assert(row.getString(0) == "2023-11-14 22:15:00")
  }

  test("receipt failures map to status 0 (etl.rs:371)") {
    val statuses = ChainOps.tokenTransfers(fx.txsDF(spark),
        fx.blocksDF(spark), fx.receiptsDF(spark))
      .groupBy(col("status")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(statuses.keySet == Set(0, 1))
    assert(statuses(0) > 0)
  }

  test("verify: continuity clean on full chain, catches any deleted block") {
    val blocks = fx.blocksDF(spark)
    assert(ChainOps.continuityGaps(blocks).count() == 0)
    assert(ChainOps.identityMismatches(blocks).count() == 0)
    val withHole = blocks.filter(col("number") =!= 117)
    val gaps = ChainOps.continuityGaps(withHole).collect()
    assert(gaps.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((118L, 116L)))
    assert(ChainOps.identityMismatches(withHole).count() > 0)
  }

  test("scalable continuity check equals the global-window form") {
    val blocks = fx.blocksDF(spark)
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (holes <- Seq(Seq(117L), Seq(49L, 50L, 150L), Seq.empty[Long])) {
      val gapped = blocks.filter(!col("number").isin(holes: _*))
      assert(asSet(ChainOps.continuityGapsScalable(gapped, 50L)) ==
        asSet(ChainOps.continuityGaps(gapped)))
    }
    // hole exactly at a bucket boundary exercises the exchange path
    val atBoundary = blocks.filter(col("number") =!= 100L)
    assert(asSet(ChainOps.continuityGapsScalable(atBoundary, 50L)) ==
      Set((101L, 99L)))
    // a gap WIDER than a bucket leaves whole buckets empty — the boundary
    // must pair across them (heights 40..159 missing at bucketSize 50
    // empties buckets 1 and 2; the missing-span report is (160, 39))
    val wideGap = blocks.filter(col("number") < 40 || col("number") >= 160)
    val wideGot = asSet(ChainOps.continuityGapsScalable(wideGap, 50L))
    assert(wideGot == Set((160L, 39L)))
    assert(wideGot == asSet(ChainOps.continuityGaps(wideGap)))
  }

  test("scalable identity check equals the global-window form") {
    val blocks = fx.blocksDF(spark)
    // global form's expected is int (row_number), scalable's is long —
    // normalize via Number
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
      .toSet
    // holes mid-bucket, at a bucket boundary (100 with bucketSize 50), and
    // none — every number above a hole shifts its expected position, so
    // the cross-bucket offset arithmetic is exercised end-to-end
    for (holes <- Seq(Seq(117L), Seq(100L), Seq(49L, 50L, 150L),
        Seq.empty[Long])) {
      val gapped = blocks.filter(!col("number").isin(holes: _*))
      assert(asSet(ChainOps.identityMismatchesScalable(gapped, 50L)) ==
        asSet(ChainOps.identityMismatches(gapped)),
        s"holes=$holes")
    }
    assert(ChainOps.identityMismatchesScalable(blocks, 50L).count() == 0)
  }

  test("maturity window: matured exactly for number <= tip-5") {
    val matured = ChainOps.withMaturity(fx.blocksDF(spark))
      .filter(col("matured") === 1).agg(max("number"), count(lit(1))).head()
    assert(matured.getLong(0) == 194) // tip 199 - 5
    assert(matured.getLong(1) == 195)
  }

  test("reorg: rollback + fork replay converges (OP-DEL-1 semantics)") {
    val forkHeight = 150
    val fork = ChainFixture.forkBlocks(fx, forkHeight, 6)
    import spark.implicits._
    val canonical = fx.blocksDF(spark)
    // detect: fork block at height 150 has a parent we know but a hash
    // mismatch vs the stored block 150 → rollback from 150, append fork
    val (keptBlocks, keptTxs, keptTransfers) = ChainOps.rollbackFrom(
      canonical, fx.txsDF(spark),
      ChainOps.tokenTransfers(fx.txsDF(spark), canonical,
        fx.receiptsDF(spark)),
      forkHeight)
    assert(keptBlocks.agg(max("number")).head().getLong(0) == 149)
    assert(keptTxs.filter($"block_number" >= forkHeight).count() == 0)
    assert(keptTransfers.filter($"block_number" >= forkHeight).count() == 0)
    val replayed = keptBlocks.unionByName(fork.toDF())
    assert(ChainOps.continuityGaps(replayed).count() == 0)
    // parent linkage across the splice point holds
    val spliced = replayed.filter($"number" === forkHeight).head()
    val parent = replayed.filter($"number" === forkHeight - 1).head()
    assert(spliced.getAs[String]("parent_hash") ==
      parent.getAs[String]("hash"))
  }

  test("tail rollback removes exactly the last N heights (OP-DEL-2)") {
    val (b, tx, tr) = ChainOps.rollbackLast(fx.blocksDF(spark),
      fx.txsDF(spark),
      ChainOps.tokenTransfers(fx.txsDF(spark), fx.blocksDF(spark),
        fx.receiptsDF(spark)),
      100)
    assert(b.agg(max("number")).head().getLong(0) == 99)
    assert(tx.agg(max("block_number")).head().getLong(0) == 99)
    assert(tr.agg(max("block_number")).head().getLong(0) <= 99)
  }

  test("address filter keeps only matching txs, blocks untouched (OP-FIL-1)") {
    val watch = Seq(ChainFixture.addr(0), ChainFixture.addr(1))
    val filtered = ChainOps.addressFilter(fx.txsDF(spark), watch)
    val bad = filtered.filter(!col("from_addr").isin(watch: _*) &&
      !col("to_addr").isin(watch: _*)).count()
    assert(bad == 0)
    assert(filtered.count() > 0)
  }

  test("view queries: point lookups and transfer filters") {
    val blocks = fx.blocksDF(spark)
    val txs = fx.txsDF(spark)
    assert(ChainOps.blockByNumber(blocks, 42).count() == 1)
    val h = fx.blocks(42).hash
    assert(ChainOps.blockByHash(blocks, h).head().getAs[Long]("number") == 42)
    assert(ChainOps.txsOfBlock(txs, 42).count() == 3)
    assert(ChainOps.blocksInRange(blocks, 190, -1).count() == 10)
    assert(ChainOps.blocksInRange(blocks, 10, 19).count() == 10)
    val transfers = ChainOps.tokenTransfers(txs, blocks, fx.receiptsDF(spark))
    val someFrom = fx.goldenTransfers.head._1.from_addr
    val f = ChainOps.addressTransfers(transfers, someFrom, TransferType.From)
    assert(f.count() ==
      fx.goldenTransfers.count(_._1.from_addr == someFrom))
    val all = ChainOps.addressTransfers(transfers, someFrom, TransferType.All)
    assert(all.count() >= f.count())
  }
}
