package graft.streaming

import graft.operators.DedupOps
import graft.store.{GraftStore, IndexStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shared per-batch core of the perceptual streaming gates
  * ([[StreamingImages]], [[StreamingAudio]]): both modalities gate a
  * binary (asset_id, payload) micro-batch identically — decode +
  * fingerprint ONCE per batch per partition, intra-batch banded
  * Hamming pair drop (larger asset_id loses), cross-batch probe of
  * the at-rest index from the already-computed hashes, survivors +
  * their band rows committed in one atomic snapshot. Only the kernel
  * differs (dHash vs PCM fingerprint), so it arrives as functions.
  *
  * Exactly-once under foreachBatch replay: a replayed batch
  * self-matches its first run's index rows at Hamming 0 (identical
  * bytes hash identically; the probes have no equal-id exclusion), so
  * the replay's survivor set is empty and nothing commits. */
private[streaming] object PerceptualGate {

  /** One micro-batch. `hashRows` decodes and fingerprints the batch
    * ((asset_id, payload) → (asset_id, hash)); `nearDupPairs` is the
    * modality's banded pair report over hash rows; `searchFromHashes`
    * probes the at-rest `kind` index; `bandRows` is the modality's
    * band explode (staged with the family's build-time skew cap). */
  def processBatch(
      store: GraftStore,
      batch: DataFrame,
      kind: String,
      acceptedTable: String,
      hashRows: DataFrame => DataFrame,
      nearDupPairs: DataFrame => DataFrame,
      searchFromHashes: DataFrame => DataFrame,
      bandRows: DataFrame => DataFrame): Unit = {
    val hashes = hashRows(batch)
      .localCheckpoint() // ONE decode: pair join, probe, stage all reuse
    val intraLosers = nearDupPairs(hashes)
      .select(col("id_b").as("asset_id")).distinct()
    val intra = hashes.join(intraLosers, Seq("asset_id"), "left_anti")
      .localCheckpoint()
    val crossLosers =
      if (store.leavesOf(IndexStore.tableOf(kind)).isEmpty)
        intra.select(col("asset_id")).limit(0)
      else searchFromHashes(intra)
        .select(col("new_id").as("asset_id")).distinct()
    val survivors = intra.join(crossLosers, Seq("asset_id"), "left_anti")
      .localCheckpoint()
    // payloads are fetched for SURVIVORS only, at the commit boundary —
    // the store write is the first (and only) exchange payload bytes
    // cross, and writing the data is moving it
    val adds = store.stageKeyed(acceptedTable,
      batch.join(survivors.select(col("asset_id")),
        Seq("asset_id"), "left_semi"),
      pmod(xxhash64(col("asset_id")), lit(IndexStore.Buckets.toLong)),
      Seq(col("asset_id"))) ++
      IndexStore.stageRows(store, kind,
        DedupOps.capBuckets(bandRows(survivors),
          Seq("band", "band_key"), DedupOps.MaxBucketSize))
    if (adds.nonEmpty)
      store.commit(adds, meta = IndexStore.formatMeta(kind))
  }
}
