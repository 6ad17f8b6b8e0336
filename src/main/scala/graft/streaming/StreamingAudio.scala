package graft.streaming

import graft.operators.AudioDedupOps
import graft.store.{GraftStore, IndexStore}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming audio ingest with perceptual near-dup dedup — the
  * [[StreamingImages]] gate for the audio modality, closing the
  * streaming row of the modality matrix (text, vectors, images, audio
  * each have batch + incremental + at-rest + streaming forms): a
  * readStream of (asset_id, payload) WAV rows passes the
  * [[PerceptualGate]] and the survivors land in the store atomically
  * with their `afp` index band rows.
  *
  * Per batch: decode + [[AudioDedupOps.afp64]] once per partition
  * (payload bytes never shuffle), intra-batch banded Hamming pair
  * drop at [[AudioDedupOps.MaxHamming]] (larger asset_id loses),
  * cross-batch probe of the at-rest `afp` index from the computed
  * fingerprints ([[IndexStore.afpSearchFromHashes]] — history PCM is
  * never re-decoded). Recall equals the batch operator's by
  * construction (same band machinery, pigeonhole-complete at d ≤ 3);
  * exactly-once under replay by the family's self-match argument. */
object StreamingAudio {

  /** Manifest table holding the accepted (asset_id, payload) rows. */
  val AcceptedTable = "accepted_audio"

  /** One micro-batch: gate, then commit survivors + their `afp` band
    * rows in one atomic snapshot. Long clips participate as their
    * chunk rows ([[AudioDedupOps.fingerprintChunks]]) — the gate
    * accepts, dedups, and indexes them like any other asset; the
    * cross probe and intra pair drop both apply the majority-coverage
    * verdict, and the at-rest truncation keeps every CHUNK live so a
    * replayed long clip's coverage self-match is total. Audit counters
    * only when `collectStats` is on (extra per-batch actions). */
  def processBatch(store: GraftStore, batch: DataFrame,
      collectStats: Boolean = false,
      batchId: Option[Long] = None): Option[PerceptualGate.GateStats] =
    PerceptualGate.processBatch(store, batch, "afp", AcceptedTable,
      AudioDedupOps.audioHashRows,
      AudioDedupOps.afpNearDupPairs,
      hashes => IndexStore.afpSearchFromHashes(store,
        batch.sparkSession, hashes, AudioDedupOps.MaxHamming),
      AudioDedupOps.afpBandRows,
      unitCols = Seq("asset_id", "chunk_idx"),
      collectStats = collectStats,
      batchId = batchId)

  /** The full pipeline: a streaming (asset_id, payload) frame driven
    * through [[processBatch]] per micro-batch; the `afp` index is the
    * only dedup state, so the pipeline resumes across restarts
    * without re-decoding history. */
  def runToAccepted(
      stream: DataFrame,
      store: GraftStore,
      checkpointDir: String,
      onStats: Option[PerceptualGate.GateStats => Unit] = None)
      : StreamingQuery =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val stats = processBatch(store, batch,
          collectStats = onStats.nonEmpty, batchId = Some(epoch))
        onStats.foreach(f => stats.foreach(f))
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** The accepted set at rest. */
  def accepted(spark: SparkSession, store: GraftStore): DataFrame =
    store.read(spark, AcceptedTable)
}
