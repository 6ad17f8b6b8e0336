package graft


import graft.operators.DedupOps
import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Incremental near-dup detection: a stream of new documents probed
  * against a static band index of the historical corpus — duplicates are
  * flagged per micro-batch without re-scanning history. */
class IncrementalDedupSpec extends AnyFunSuite with BeforeAndAfterAll
    with TempDirCleanup {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  private def corpus: DataFrame =
    Tables.t(spark, dir, "documents").select("doc_id", "text")

  /** Near-copy of an existing doc under a new id (every 23rd token
    * replaced, same perturbation the batch dedup queries use). */
  private def nearCopyOf(src: DataFrame, srcId: Long, newId: Long): DataFrame =
    src.filter(col("doc_id") === srcId).select(
      lit(newId).as("doc_id"),
      expr("""concat_ws(' ', transform(split(text, '\\s+'),
             |  (x, i) -> IF(i % 23 = 0, 'xdupx', x)))""".stripMargin)
        .as("text"))

  test("batch probe: new near-copies match their sources via the index") {
    val index = DedupOps.buildBandIndex(corpus).cache()
    val fresh = nearCopyOf(corpus, 3L, 900003L)
      .unionAll(nearCopyOf(corpus, 7L, 900007L))
      .unionAll(corpus.filter(col("doc_id") === 450) // unrelated doc,
        .select((col("doc_id") + 800000).as("doc_id"), // fresh id, same text
          lit("completely different words that match nothing in the corpus at all zero overlap expected here truly")
            .as("text")))
    val hits = DedupOps.incrementalNearDup(fresh, index, 0.4)
      .collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("existing_id")))
    assert(hits.contains((900003L, 3L)))
    assert(hits.contains((900007L, 7L)))
    assert(!hits.exists(_._1 == 800450L))
  }

  test("streaming probe: duplicates flagged per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val index = DedupOps.buildBandIndex(corpus).cache()
    val incoming = MemoryStream[(Long, String)]
    val flagged = scala.collection.mutable.Set[(Long, Long)]()
    val q = incoming.toDF().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        DedupOps.incrementalNearDup(batch, index, 0.4).collect().foreach(r =>
          flagged += ((r.getAs[Long]("new_id"), r.getAs[Long]("existing_id"))))
        ()
      }
      .option("checkpointLocation",
        tempDir("graft-ckpt"))
      .start()
    val copy = nearCopyOf(corpus, 11L, 900011L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    incoming.addData(copy.toSeq)
    q.processAllAvailable()
    q.stop()
    assert(flagged.contains((900011L, 11L)))
  }

  test("span probe: slice copies match via the postings index, fresh text doesn't") {
    import spark.implicits._
    val index = DedupOps.buildSpanIndex(corpus).cache()
    val slice = corpus.filter(col("doc_id") === 3)
      .select(lit(900003L).as("doc_id"),
        concat(substring(col("text"), 41, 160), lit(" probe tail"))
          .as("text"))
    val fresh = Seq((800450L,
      "entirely novel characters assembled uniquely qqq www zzz vvv kkk " +
        "jjj xxx yyy with no twenty char overlap against anything stored"))
      .toDF("doc_id", "text")
    val hits = DedupOps
      .incrementalSharedSpans(slice.unionAll(fresh), index)
      .collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("existing_id")))
    assert(hits.contains((900003L, 3L)))
    assert(!hits.exists(_._1 == 800450L))
  }
}
