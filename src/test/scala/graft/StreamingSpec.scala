package graft

import java.sql.Timestamp

import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming surface: watermarked window agg and stateful sessionization
  * driven through MemoryStream micro-batches; stream results must agree
  * with the equivalent batch computation (same-code-both-modes contract).
  */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll
    with TempDirCleanup {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  private def ts(minutes: Long): Timestamp =
    new Timestamp(1700000000000L + minutes * 60000L)

  private def sampleEvents: Seq[Event] =
    (0 until 240).map { i =>
      Event(i.toLong, ts(i.toLong), i % 5L,
        if (i % 3 == 0) "click" else "view", (i % 7).toDouble)
    }

  test("windowed counts over a stream equal the batch computation") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = StreamOps.windowedCounts(stream.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("win_counts")
      .option("checkpointLocation",
        tempDir("graft-ckpt"))
      .start()
    // two batches + a watermark-advancing flush batch
    stream.addData(sampleEvents.take(120))
    q.processAllAvailable()
    stream.addData(sampleEvents.drop(120))
    q.processAllAvailable()
    stream.addData(Event(9999L, ts(1000), 0L, "view", 0.0)) // advance wm
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("win_counts")
      .select("window_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    val batch = StreamOps.windowedCounts(
        sampleEvents.toDF().withColumn("ts", col("ts")))
      .select("window_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(batch.subsetOf(streamed))
    assert(batch.nonEmpty)
  }

  test("stateful sessionization closes sessions on gaps") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // user 1: burst at t0..t10, 45-minute gap, burst at t55..t60
    val burst1 = (0 to 10).map(i =>
      Event(i.toLong, ts(i.toLong), 1L, "click", 1.0))
    val burst2 = (55 to 60).map(i =>
      Event(i.toLong, ts(i.toLong), 1L, "click", 2.0))
    val stream = MemoryStream[Event]
    val q = StreamOps.sessionize(stream.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions")
      .option("checkpointLocation",
        tempDir("graft-ckpt"))
      .start()
    stream.addData(burst1)
    q.processAllAvailable()
    stream.addData(burst2)
    q.processAllAvailable()
    q.stop()
    val closed = spark.table("sessions").as[StreamOps.SessionSummary]
      .collect()
    assert(closed.length == 1) // first burst closed by the 45-min gap
    assert(closed.head.n_events == 11)
    assert(closed.head.total_value == 11.0)
    assert(closed.head.started_at == ts(0) && closed.head.ended_at == ts(10))
  }

  test("batch session_window agrees with the corpus events table") {
    val dir = "/root/testdata/sf0.001"
    val sessions = StreamOps.sessionizeBatch(spark,
      Tables.t(spark, dir, "events"))
    assert(sessions.count() > 0)
    // sessions are disjoint per user and cover all events
    val total = sessions.agg(sum("n_events")).head().getLong(0)
    assert(total == Tables.t(spark, dir, "events").count())
  }
}
