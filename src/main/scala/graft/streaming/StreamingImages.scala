package graft.streaming

import graft.operators.ImageDedupOps
import graft.store.{GraftStore, IndexStore}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming image ingest with perceptual near-dup dedup — the
  * [[StreamingVectors]] shape applied to the image modality, completing
  * the batch / incremental / at-rest symmetry the other modalities
  * have: a readStream of (asset_id, payload) rows passes per-batch
  * gates ([[PerceptualGate]]) and the survivors land in the store
  * atomically with their `phash` index band rows.
  *
  * Gates per batch:
  *  1. decode + dHash ONCE per batch, per partition
  *     ([[ImageDedupOps.imageHashRows]] — pixel bytes never shuffle;
  *     every later stage reads the 16-byte hash rows);
  *  2. intra-batch dedup — the family's banded Hamming pair join
  *     ([[ImageDedupOps.phashNearDupPairs]]) at the operator's
  *     [[ImageDedupOps.MaxHamming]]; every detected pair loses its
  *     LARGER asset_id (the greedy streaming drop);
  *  3. cross-batch dedup — probe the at-rest `phash` index from the
  *     ALREADY-COMPUTED hashes ([[IndexStore.phashSearchFromHashes]]:
  *     manifest prune + pushed band-key filter; history pixels are
  *     never re-decoded, and neither is the batch).
  *
  * Unlike the vector gate there is no multi-probe margin machinery:
  * Hamming banding needs no flip gating — a pair at d ≤ 3 is
  * pigeonhole-guaranteed to agree on a whole band, and the 4..6 zone
  * rides the band-OR condition exactly as in the batch operator, so
  * the gate's recall equals the batch operator's by construction.
  *
  * Exactly-once under foreachBatch replay, by the vector gate's
  * argument: survivors and their band rows commit in ONE snapshot
  * swap, and a replayed batch self-matches its first run's index rows
  * at Hamming 0, so the replay commits nothing. */
object StreamingImages {

  /** Manifest table holding the accepted (asset_id, payload) rows. */
  val AcceptedTable = "accepted_images"

  /** One micro-batch: gate, then commit survivors + their `phash`
    * band rows in one atomic snapshot. Audit counters
    * ([[PerceptualGate.GateStats]]) are returned only when
    * `collectStats` is on — they cost extra per-batch actions, so the
    * hot path ([[runToAccepted]]) leaves them off. */
  def processBatch(store: GraftStore, batch: DataFrame,
      collectStats: Boolean = false,
      batchId: Option[Long] = None): Option[PerceptualGate.GateStats] =
    PerceptualGate.processBatch(store, batch, "phash", AcceptedTable,
      ImageDedupOps.imageHashRows,
      ImageDedupOps.phashNearDupPairs,
      hashes => IndexStore.phashSearchFromHashes(store,
        batch.sparkSession, hashes, ImageDedupOps.MaxHamming),
      ImageDedupOps.bandRows,
      unitCols = Seq("asset_id"),
      collectStats = collectStats,
      batchId = batchId)

  /** The full pipeline: a streaming (asset_id, payload) frame driven
    * through [[processBatch]] per micro-batch. The `phash` index is
    * the only dedup state, committed atomically with the assets it
    * indexes, so the pipeline resumes across restarts without
    * re-decoding history. */
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
