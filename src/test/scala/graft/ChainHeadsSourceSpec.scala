package graft


import graft.chain.{ChainFixture, ChainOps}
import graft.etl.{Backfill, FixtureSource, Tail}
import graft.store.GraftStore
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The custom MicroBatchStream heads source driving the real tail ingest
  * end-to-end: readStream from height offsets → foreachBatch → store. */
class ChainHeadsSourceSpec extends AnyFunSuite with BeforeAndAfterAll
    with TempDirCleanup {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  test("heads stream feeds tail ingest from height offsets to a full store") {
    val fx = ChainFixture.build(200)
    val store = new GraftStore(
      tempDir("graft-store"), bucketSize = 50L)
    Backfill.run(spark, new FixtureSource(fx), store, 0, 99)

    val heads = spark.readStream
      .format("graft.sources.ChainHeadsProvider")
      .option("numBlocks", "200")
      .option("blocksPerBatch", "40")
      .load()
    val q = Tail.attach(spark, store, new FixtureSource(fx), heads)
      .option("checkpointLocation",
        tempDir("graft-ckpt"))
      .start()
    q.processAllAvailable()
    q.stop()

    val blocks = store.read(spark, "blocks")
    assert(blocks.count() == 200)
    assert(ChainOps.continuityGaps(blocks).count() == 0)
    assert(store.read(spark, "token_transfers").count() ==
      fx.goldenTransfers.size)
  }

  test("latestOffset is monotonic across restarts: a restored checkpoint " +
      "offset seeds the release cursor") {
    // a restarted query calls deserializeOffset with the checkpointed
    // offset BEFORE any latestOffset poll; the stream's in-memory
    // cursor restarts at 0, and without the seed the next poll would
    // return a SMALLER offset — Spark would then re-emit committed
    // heights as duplicates
    val s = new graft.sources.ChainHeadsStream(200, 40, None, None)
    s.deserializeOffset("100")
    val next = s.latestOffset()
      .asInstanceOf[graft.sources.HeightOffset].height
    assert(next >= 100, s"offset went backwards after restore: $next")
  }

  test("wsUrl without apiUrl is rejected (no silent fixture data plane)") {
    val e = intercept[Exception] {
      spark.readStream
        .format("graft.sources.ChainHeadsProvider")
        .option("wsUrl", "ws://localhost:1/")
        .load()
    }
    assert(e.getMessage.contains("wsUrl requires apiUrl"), e.getMessage)
  }
}
