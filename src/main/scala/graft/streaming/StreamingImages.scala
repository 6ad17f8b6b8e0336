package graft.streaming

import graft.operators.{DedupOps, ImageDedupOps}
import graft.store.{GraftStore, IndexStore}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming image ingest with perceptual near-dup dedup — the
  * [[StreamingVectors]] shape applied to the image modality, completing
  * the batch / incremental / at-rest symmetry the other modalities
  * have: a readStream of (asset_id, payload) rows passes per-batch
  * gates and the survivors land in the store atomically with their
  * `phash` index band rows.
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
  * at Hamming 0 (identical bytes hash identically; the probe has no
  * equal-id exclusion), so the replay commits nothing. */
object StreamingImages {

  /** Manifest table holding the accepted (asset_id, payload) rows. */
  val AcceptedTable = "accepted_images"

  /** One micro-batch: gate, then commit survivors + their `phash`
    * band rows in one atomic snapshot. */
  def processBatch(store: GraftStore, batch: DataFrame): Unit = {
    val spark = batch.sparkSession
    val hashes = ImageDedupOps.imageHashRows(batch)
      .localCheckpoint() // ONE decode: pair join, probe, stage all reuse
    val intraLosers = ImageDedupOps.phashNearDupPairs(hashes)
      .select(col("id_b").as("asset_id")).distinct()
    val intra = hashes.join(intraLosers, Seq("asset_id"), "left_anti")
      .localCheckpoint()
    val crossLosers =
      if (store.leavesOf(IndexStore.tableOf("phash")).isEmpty)
        intra.select(col("asset_id")).limit(0)
      else IndexStore.phashSearchFromHashes(store, spark, intra,
        ImageDedupOps.MaxHamming)
        .select(col("new_id").as("asset_id")).distinct()
    val survivors = intra.join(crossLosers, Seq("asset_id"), "left_anti")
      .localCheckpoint()
    // payloads are fetched for SURVIVORS only, at the commit boundary —
    // the store write is the first (and only) exchange payload bytes
    // cross, and writing the data is moving it
    val adds = store.stageKeyed(AcceptedTable,
      batch.join(survivors.select(col("asset_id")),
        Seq("asset_id"), "left_semi"),
      pmod(xxhash64(col("asset_id")), lit(IndexStore.Buckets.toLong)),
      Seq(col("asset_id"))) ++
      IndexStore.stageRows(store, "phash",
        DedupOps.capBuckets(ImageDedupOps.bandRows(survivors),
          Seq("band", "band_key"), DedupOps.MaxBucketSize))
    if (adds.nonEmpty)
      store.commit(adds, meta = IndexStore.formatMeta("phash"))
  }

  /** The full pipeline: a streaming (asset_id, payload) frame driven
    * through [[processBatch]] per micro-batch. The `phash` index is
    * the only dedup state, committed atomically with the assets it
    * indexes, so the pipeline resumes across restarts without
    * re-decoding history. */
  def runToAccepted(
      stream: DataFrame,
      store: GraftStore,
      checkpointDir: String): StreamingQuery =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(store, batch)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** The accepted set at rest. */
  def accepted(spark: SparkSession, store: GraftStore): DataFrame =
    store.read(spark, AcceptedTable)
}
