package graft

import java.nio.file.Files

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
class StreamingCurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

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
        Files.createTempDirectory("graft-ckpt").toString)
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
}
