package graft

import java.nio.file.Files

import graft.chain.{ChainFixture, ChainOps}
import graft.etl.{Backfill, ChainSource, Export, FixtureSource}
import graft.store.GraftStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Export orchestration: lazy gate, crash-retry with tail wipe, retention
  * sweep (OP-STR-5/6/7, export.rs:46-71 semantics). */
class ExportSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  lazy val fx: ChainFixture.Fixture = ChainFixture.build(200)

  override def afterAll(): Unit = spark.stop()

  private def newStore() = new GraftStore(
    Files.createTempDirectory("graft-store").toString, bucketSize = 50L)

  /** Source that fails mid-ingest for the first `failures` attempts. */
  private class FlakySource(inner: ChainSource, failures: Int)
      extends ChainSource {
    var attempts = 0
    override def tipHeight(s: SparkSession): Long = inner.tipHeight(s)
    override def blocks(s: SparkSession, from: Long, to: Long): DataFrame = {
      attempts += 1
      if (attempts <= failures)
        throw new RuntimeException(s"simulated RPC failure #$attempts")
      inner.blocks(s, from, to)
    }
    override def transactions(s: SparkSession, from: Long, to: Long): DataFrame =
      inner.transactions(s, from, to)
    override def receipts(s: SparkSession, from: Long, to: Long): DataFrame =
      inner.receipts(s, from, to)
  }

  test("export completes after transient failures via retry + tail wipe") {
    val store = newStore()
    // pre-ingest some history so the retry path has a tail to wipe
    Backfill.run(spark, new FixtureSource(fx), store, 0, 120)
    val flaky = new FlakySource(new FixtureSource(fx), failures = 2)
    val summary = Export.run(spark, flaky, store,
      Export.Config(retries = 5, wipeOnRetry = 20))
    assert(summary.attempts == 3)
    assert(summary.finalHeight == 199)
    val blocks = store.read(spark, "blocks")
    assert(blocks.count() == 200)
    assert(ChainOps.continuityGaps(blocks).count() == 0)
    assert(store.read(spark, "token_transfers").count() ==
      fx.goldenTransfers.size)
  }

  test("export gives up after exhausting retries") {
    val store = newStore()
    val flaky = new FlakySource(new FixtureSource(fx), failures = 99)
    val e = intercept[RuntimeException] {
      Export.run(spark, flaky, store, Export.Config(retries = 3))
    }
    assert(e.getMessage.contains("after 3 attempts"))
  }

  test("lazy gate polls until ready before ingesting (OP-STR-5)") {
    val store = newStore()
    var polls = 0
    val gate = () => { polls += 1; polls >= 3 }
    Export.run(spark, new FixtureSource(fx), store,
      Export.Config(lazyGate = gate, gatePollMs = 1))
    assert(polls >= 3)
    assert(store.read(spark, "blocks").count() == 200)
  }

  test("retention drops whole expired buckets, metadata-only (OP-DEL-3)") {
    val store = newStore()
    Backfill.run(spark, new FixtureSource(fx), store, 0, 199)
    // tip ts = 1700000000 + 1990; retain 1000s → cutoff 1700000990:
    // bucket 0 (max_ts 1700000490) is fully expired; bucket 1's max_ts
    // equals the cutoff exactly, so it is kept (retention is a floor)
    val dropped = Export.retentionSweep(spark, store,
      1700000000L + 1990L, 1000L)
    assert(dropped > 0)
    val kept = store.read(spark, "blocks")
    assert(kept.agg(org.apache.spark.sql.functions.min("number"))
      .head().getLong(0) == 50L)
  }
}
