package graft.streaming

import graft.operators.DedupOps
import graft.store.{GraftStore, IndexStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shared per-batch core of the perceptual streaming gates
  * ([[StreamingImages]], [[StreamingAudio]]): both modalities gate a
  * binary (asset_id, payload) micro-batch identically — decode +
  * fingerprint ONCE per batch per partition, an EXACT-fingerprint
  * collapse (identical assets keep the smallest id — a linear groupBy,
  * so a flood of byte-identical clips can never reach the pair join,
  * let alone overflow its bucket cap), intra-batch banded Hamming pair
  * drop among the exact-distinct representatives (larger asset_id
  * loses), cross-batch probe of the at-rest index from the
  * already-computed hashes, survivors + their band rows committed in
  * one atomic snapshot. Only the kernel differs (dHash vs per-chunk
  * PCM fingerprints), so it arrives as functions.
  *
  * Exactly-once under foreachBatch replay: a replayed batch
  * self-matches its first run's index rows at Hamming 0 (identical
  * bytes hash identically; the probes have no equal-id exclusion), so
  * the replay's survivor set is empty and nothing commits. Two
  * ingredients keep that argument airtight under skew: the staged
  * band rows use [[DedupOps.truncateBuckets]] — over-cap (band,
  * band_key) groups TRUNCATE, and every survivor is guaranteed at
  * least one at-rest band row (a whole-group drop could commit a
  * survivor with zero index rows, which a replay would re-admit) —
  * and the exact collapse bounds how many same-fingerprint assets a
  * batch can ever try to stage (one).
  *
  * Honest residual: 65+ MUTUALLY-DISTINCT fingerprints within one
  * band bucket in one batch still hit the pair join's whole-group
  * cap ([[DedupOps.capBuckets]] inside the modality pair fns — the
  * quadratic bound is the point), so near-identical-but-unequal
  * floods dedup only partially within their first batch; their
  * survivors' band rows are at rest, so subsequent batches catch
  * them via the cross probe. [[GateStats.cappedBandRows]] surfaces
  * when truncation fired. */
private[streaming] object PerceptualGate {

  /** Per-batch audit counters, returned so a caller (or spec) can see
    * what the gate did — batch size and each drop class, plus how many
    * survivor band rows the at-rest truncation policy capped out. */
  final case class GateStats(
      batchAssets: Long,
      exactDropped: Long,
      intraDropped: Long,
      crossDropped: Long,
      survivors: Long,
      cappedBandRows: Long)

  /** One micro-batch. `hashRows` decodes and fingerprints the batch
    * ((asset_id, payload) → hash rows; one row per asset for images,
    * one per chunk for audio); `nearDupPairs` is the modality's banded
    * ASSET-level pair report over hash rows; `searchFromHashes` probes
    * the at-rest `kind` index; `bandRows` is the modality's band
    * explode; `bandOrder` the deterministic within-bucket order the
    * staging truncation uses. */
  def processBatch(
      store: GraftStore,
      batch: DataFrame,
      kind: String,
      acceptedTable: String,
      hashRows: DataFrame => DataFrame,
      nearDupPairs: DataFrame => DataFrame,
      searchFromHashes: DataFrame => DataFrame,
      bandRows: DataFrame => DataFrame,
      bandOrder: Seq[String]): GateStats = {
    val hashes = hashRows(batch)
      .localCheckpoint() // ONE decode: collapse, pair join, probe, stage
    val batchAssets = hashes.select(col("asset_id")).distinct().count()
    // 1. exact-fingerprint collapse: per-asset signature = the sorted
    //    list of its hash rows' data columns (one phash, or every
    //    (chunk_idx, n_chunks, afp) row); identical signatures keep the
    //    smallest asset_id. Linear — two narrow keyed exchanges — so a
    //    flood of identical assets collapses BEFORE any pair join.
    val dataCols = hashes.columns.filterNot(_ == "asset_id").map(col)
    val sigs = hashes.groupBy(col("asset_id"))
      .agg(sort_array(collect_list(struct(dataCols: _*))).as("__sig"))
    val reps = sigs.groupBy(col("__sig"))
      .agg(min(col("asset_id")).as("asset_id"))
      .select(col("asset_id"))
    val exact = hashes.join(reps, Seq("asset_id"), "left_semi")
      .localCheckpoint()
    // 2. intra-batch near-dup drop among representatives
    val intraLosers = nearDupPairs(exact)
      .select(col("id_b").as("asset_id")).distinct()
    val intra = exact.join(intraLosers, Seq("asset_id"), "left_anti")
      .localCheckpoint()
    // 3. cross-batch probe from the already-computed hashes
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
    val allBandRows = bandRows(survivors).localCheckpoint()
    val stagedBandRows = DedupOps.truncateBuckets(allBandRows,
      Seq("band", "band_key"), DedupOps.MaxBucketSize,
      "asset_id", bandOrder).localCheckpoint()
    val adds = store.stageKeyed(acceptedTable,
      batch.join(survivors.select(col("asset_id")),
        Seq("asset_id"), "left_semi"),
      pmod(xxhash64(col("asset_id")), lit(IndexStore.Buckets.toLong)),
      Seq(col("asset_id"))) ++
      IndexStore.stageRows(store, kind, stagedBandRows)
    if (adds.nonEmpty)
      store.commit(adds, meta = IndexStore.formatMeta(kind))
    val nExact = exact.select(col("asset_id")).distinct().count()
    val nIntra = intra.select(col("asset_id")).distinct().count()
    val nSurv = survivors.select(col("asset_id")).distinct().count()
    GateStats(
      batchAssets = batchAssets,
      exactDropped = batchAssets - nExact,
      intraDropped = nExact - nIntra,
      crossDropped = nIntra - nSurv,
      survivors = nSurv,
      cappedBandRows = allBandRows.count() - stagedBandRows.count())
  }
}
