package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.Files

import graft.chain.ChainFixture
import graft.etl.{Backfill, FixtureSource}
import graft.store.GraftStore
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** CLI verify parity: chain-tip lag reporting (verify.rs:35-39) and the
  * real `verify transactions` check (reference stub, verify.rs:92). */
class CliSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  lazy val fx: ChainFixture.Fixture = ChainFixture.build(200)

  override def afterAll(): Unit = spark.stop()

  private def newRoot(): String =
    Files.createTempDirectory("graft-store").toString

  private def captured(body: => Unit): String = {
    val out = new ByteArrayOutputStream()
    Console.withOut(new PrintStream(out)) { body }
    out.toString
  }

  test("curate runs the corpus pipeline end to end and writes shards") {
    import org.apache.spark.sql.functions._
    val out = Files.createTempDirectory("graft-curate").toString
    val printed = captured {
      cli.Main.run(spark, Array("curate",
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out,
        "--quality-floor-bp", "3000",
        "--docs-per-shard", "25"))
    }
    assert(printed.contains("[curate] kept"))
    assert(printed.contains("wrote"))
    val back = spark.read.parquet(out)
    val n = back.count()
    assert(n > 0)
    // the written corpus respects the floor, carries a valid split and
    // the payload, and is exactly-once per doc
    // null-inclusive predicates: a null quality_bp/split must FAIL these
    // checks, not slip through a null-valued filter
    assert(back.filter(col("quality_bp").isNull ||
      col("quality_bp") < 3000).count() == 0)
    assert(back.filter(col("split").isNull ||
      !col("split").isin("train", "val", "test")).count() == 0)
    assert(back.filter(col("text").isNull).count() == 0)
    assert(back.select("doc_id").distinct().count() == n)
    // shard dirs exist with ≤ 25 docs each
    val shards = back.groupBy("shard").count().collect()
      .map(_.getAs[Long]("count"))
    assert(shards.forall(_ <= 25))
  }

  test("verify blocks reports the store's lag behind the chain tip") {
    val root = newRoot()
    // store stops at 196 while the fixture chain tip is 199 → lag 3
    Backfill.run(spark, new FixtureSource(fx), new GraftStore(root), 0, 196)
    val out = captured {
      cli.Main.run(spark, Array("verify", "blocks", "--store", root))
    }
    assert(out.contains("blocks OK"))
    assert(out.contains("stored max 196"))
    assert(out.contains("chain tip 199"))
    assert(out.contains("lag 3"))
  }

  test("verify transactions passes on a full ingest, fails on a filtered one") {
    val full = newRoot()
    Backfill.run(spark, new FixtureSource(fx), new GraftStore(full), 0, 99)
    val ok = captured {
      cli.Main.run(spark, Array("verify", "transactions", "--store", full))
    }
    assert(ok.contains("transactions OK"))

    val filtered = newRoot()
    // address filter drops txs → stored counts < header transaction_count
    Backfill.run(spark, new FixtureSource(fx), new GraftStore(filtered), 0, 99,
      addressFilter = Seq("cb000000000000000000000000000000000000000000"))
    val e = intercept[RuntimeException] {
      cli.Main.run(spark,
        Array("verify", "transactions", "--store", filtered))
    }
    assert(e.getMessage.contains("stored tx"))
  }
}
