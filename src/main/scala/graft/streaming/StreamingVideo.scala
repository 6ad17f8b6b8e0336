package graft.streaming

import graft.operators.{ImageDedupOps, VideoDedupOps}
import graft.store.{GraftStore, IndexStore}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming video ingest with frame-based near-dup dedup — the
  * [[StreamingImages]]/[[StreamingAudio]] gate for the video modality,
  * completing the last cell of the modality matrix (every modality now
  * has batch + at-rest + streaming forms): a readStream of
  * `(asset_id, frame_idx, payload)` PRE-EXTRACTED frame rows (asset_id
  * is the video id; the codec boundary is [[VideoDedupOps]]'s) passes
  * the [[PerceptualGate]] and the surviving videos' frames land in the
  * store atomically with their `vhash` index band rows.
  *
  * Per batch: decode + per-frame dHash once per partition (frame
  * payloads never shuffle), exact-signature collapse (a video's
  * signature is its SORTED frame-hash list, so re-delivered and
  * re-encoded-identical videos collapse linearly), intra-batch
  * majority-coverage pair drop at [[ImageDedupOps.MaxHamming]] per
  * frame (larger asset_id loses), cross-batch probe of the at-rest
  * `vhash` index from the computed hashes
  * ([[IndexStore.vhashSearchFromHashes]] — history frames are never
  * re-decoded). Exactly-once under replay by the family's self-match
  * argument: every frame of a re-delivered video matches its first
  * run's rows at Hamming 0, coverage is total, the verdict fires. */
object StreamingVideo {

  /** Manifest table holding the accepted (asset_id, frame_idx,
    * payload) frame rows of surviving videos. */
  val AcceptedTable = "accepted_video_frames"

  /** One micro-batch: gate, then commit surviving videos' frames +
    * their `vhash` band rows in one atomic snapshot. Only HASHABLE
    * frames commit — the gate semi-joins the batch on the survivors'
    * hash rows' (asset_id, frame_idx), so an undecodable frame of a
    * surviving video (already excluded from its n_frames denominator
    * and reported by [[VideoDedupOps.videoFrameRejects]]) never lands
    * in the accepted table the vhash index cannot cover. Audit
    * counters only when `collectStats` is on. */
  def processBatch(store: GraftStore, batch: DataFrame,
      collectStats: Boolean = false,
      batchId: Option[Long] = None): Option[PerceptualGate.GateStats] =
    PerceptualGate.processBatch(store, batch, "vhash", AcceptedTable,
      VideoDedupOps.assetHashRows,
      VideoDedupOps.assetNearDupPairs,
      hashes => IndexStore.vhashSearchFromHashes(store,
        batch.sparkSession, hashes, ImageDedupOps.MaxHamming),
      VideoDedupOps.assetBandRows,
      unitCols = Seq("asset_id", "frame_idx"),
      collectStats = collectStats,
      batchId = batchId)

  /** The full pipeline: a streaming (asset_id, frame_idx, payload)
    * frame driven through [[processBatch]] per micro-batch; the
    * `vhash` index is the only dedup state, so the pipeline resumes
    * across restarts without re-decoding history. */
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

  /** The accepted frame set at rest. */
  def accepted(spark: SparkSession, store: GraftStore): DataFrame =
    store.read(spark, AcceptedTable)
}
