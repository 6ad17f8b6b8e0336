package graft


import graft.chain.ChainFixture
import graft.etl.{Backfill, FixtureSource}
import graft.store.{GraftStore, JdbcSink}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** JDBC sink parity (reference `--storage sqlite3/postgres`): export the
  * parquet store into embedded Derby and read it back through Spark's
  * JDBC source. */
class JdbcSinkSpec extends AnyFunSuite with BeforeAndAfterAll
    with TempDirCleanup {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  lazy val fx: ChainFixture.Fixture = ChainFixture.build(60)

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  test("store tables round-trip through a JDBC database") {
    val store = new GraftStore(
      tempDir("graft-store"), bucketSize = 50L)
    Backfill.run(spark, new FixtureSource(fx), store, 0, 59)
    val db = tempPath("graft-derby").resolve("db")
    val url = s"jdbc:derby:$db;create=true"

    val counts = JdbcSink.export(spark, store, url, prefix = "p1")
    assert(counts("blocks") == 60)
    assert(counts("transactions") == 180)
    assert(counts("token_transfers") ==
      fx.goldenTransfers.count(_._1.block_number < 60))

    val back = spark.read.jdbc(url, "p1_blocks", new java.util.Properties())
    assert(back.count() == 60)
    val b42 = back.filter(org.apache.spark.sql.functions.col("number") === 42)
      .select("hash", "parent_hash").head()
    assert(b42.getString(0) == fx.blocks(42).hash)
    assert(b42.getString(1) == fx.blocks(41).hash)

    // a second export under another prefix coexists in the same database
    JdbcSink.export(spark, store, url, prefix = "p2")
    assert(spark.read.jdbc(url, "p2_blocks", new java.util.Properties())
      .count() == 60)
  }
}
