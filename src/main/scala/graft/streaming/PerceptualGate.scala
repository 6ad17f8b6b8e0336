package graft.streaming

import graft.operators.DedupOps
import graft.store.{GraftStore, IndexStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shared per-batch core of the perceptual streaming gates
  * ([[StreamingImages]], [[StreamingAudio]], [[StreamingVideo]]): all
  * three modalities gate a binary micro-batch identically — decode +
  * fingerprint ONCE per batch per partition, an EXACT-fingerprint
  * collapse (identical assets keep the smallest id — a linear groupBy,
  * so a flood of byte-identical clips can never reach the pair join,
  * let alone overflow its bucket cap), intra-batch banded Hamming pair
  * drop among the exact-distinct representatives (larger asset_id
  * loses), cross-batch probe of the at-rest index from the
  * already-computed hashes, survivors + their band rows committed in
  * one atomic snapshot. Only the kernel differs (dHash vs per-chunk
  * PCM fingerprints vs per-frame dHash), so it arrives as functions.
  *
  * Exactly-once under foreachBatch replay: a replayed batch
  * self-matches its first run's index rows at Hamming 0 (identical
  * bytes hash identically; the probes have no equal-id exclusion), so
  * the replay's survivor set is empty and nothing commits. Two
  * ingredients keep that argument airtight under skew: the staged
  * band rows use [[DedupOps.truncateBuckets]] keyed on the modality's
  * UNIT — asset for images, (asset, chunk) for audio, (asset, frame)
  * for video — so over-cap (band, band_key) groups TRUNCATE and every
  * unit of every survivor is guaranteed at least one at-rest band row
  * (a whole-group drop could commit a survivor with zero index rows;
  * a per-ASSET liveness key could drop a minority chunk/frame's last
  * row, and the majority-coverage verdict — 2·matched > n_units on
  * BOTH sides — would then fail the replay self-match and re-admit
  * the asset; per-UNIT keys make the self-match coverage TOTAL) — and
  * the exact collapse bounds how many same-fingerprint assets a batch
  * can ever try to stage (one).
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

  /** Snapshot-meta key of the modality's foreachBatch epoch cursor —
    * committed atomically WITH the batch's data
    * ([[graft.streaming.StreamingCuration.BatchIdKey]]'s pattern): a
    * replayed epoch at or below the cursor skips the whole batch,
    * including its DECODE pass — correctness never needed the skip
    * (self-match at Hamming 0 is total), but a replay was paying a
    * full payload decode + probe to rediscover that nothing commits.
    * Same caveats: one stream per (store, kind), one checkpoint
    * lineage. */
  def batchIdKey(kind: String): String = s"gate_batch_id_$kind"

  /** Per-batch audit counters, returned when a caller opts in
    * (`collectStats = true`) — batch size and each drop class, plus
    * how many survivor band rows the at-rest truncation policy capped
    * out. `undecodedDropped` counts assets NONE of whose payloads
    * decoded to a single hash row (they can never survive the gate —
    * no hash, no probe — and before round 17 they were invisible to
    * the audit: they appear in the raw batch but in no downstream
    * frame). Stats cost real per-batch actions (one distinct count per
    * stage plus a raw-batch scan), so the streaming hot path
    * ([[StreamingImages.runToAccepted]] et al.) leaves them off. */
  final case class GateStats(
      batchAssets: Long,
      undecodedDropped: Long,
      exactDropped: Long,
      intraDropped: Long,
      crossDropped: Long,
      survivors: Long,
      cappedBandRows: Long)

  /** One micro-batch. `hashRows` decodes and fingerprints the batch
    * ((asset_id, payload[, frame_idx]) → hash rows; one row per asset
    * for images, one per chunk for audio, one per frame for video);
    * `nearDupPairs` is the modality's banded ASSET-level pair report
    * over hash rows; `searchFromHashes` probes the at-rest `kind`
    * index; `bandRows` is the modality's band explode; `unitCols` the
    * modality's fingerprint-unit key within the hash rows —
    * Seq(asset_id) / Seq(asset_id, chunk_idx) / Seq(asset_id,
    * frame_idx) — which is both the at-rest truncation's liveness key
    * and its deterministic within-bucket order.
    *
    * Committed rows: the batch rows of surviving assets, SEMI-JOINED
    * to the survivors' hash rows on every batch column the hash rows
    * share (asset_id for images/audio — all of a survivor's rows;
    * (asset_id, frame_idx) for video — only its HASHABLE frames, so
    * the accepted table never carries an undecodable frame the vhash
    * index cannot cover and the frame rejects audit already
    * reported). */
  def processBatch(
      store: GraftStore,
      batch: DataFrame,
      kind: String,
      acceptedTable: String,
      hashRows: DataFrame => DataFrame,
      nearDupPairs: DataFrame => DataFrame,
      searchFromHashes: DataFrame => DataFrame,
      bandRows: DataFrame => DataFrame,
      unitCols: Seq[String],
      collectStats: Boolean = false,
      batchId: Option[Long] = None): Option[GateStats] = {
    val committedEpoch = store.currentMeta()
      .get(store.metaKey(batchIdKey(kind))).map(_.toLong)
    if (batchId.exists(id => committedEpoch.exists(_ >= id)))
      return None // epoch already committed — skip, no decode
    val hashes = hashRows(batch)
      .localCheckpoint() // ONE decode: collapse, pair join, probe, stage
    // 1. exact-fingerprint collapse: per-asset signature = the sorted
    //    list of its hash rows' data columns (one phash, or every
    //    (chunk_idx, n_chunks, afp) row); identical signatures keep the
    //    smallest asset_id. Linear — two narrow keyed exchanges — so a
    //    flood of identical assets collapses BEFORE any pair join.
    val dataCols = hashes.columns.filterNot(_ == "asset_id").map(col)
    val sigs = hashes.groupBy(col("asset_id"))
      .agg(sort_array(collect_list(struct(dataCols.toIndexedSeq: _*)))
        .as("__sig"))
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
    // cross, and writing the data is moving it. The commit key is every
    // batch column the hash rows share, so only HASHABLE units commit.
    val commitKeys = batch.columns.filter(hashes.columns.contains).toSeq
    val allBandRows = bandRows(survivors)
    val stagedBandRows = DedupOps.truncateBuckets(allBandRows,
      Seq("band", "band_key"), DedupOps.MaxBucketSize,
      unitCols, unitCols).localCheckpoint()
    val adds = store.stageKeyed(acceptedTable,
      batch.join(survivors.select(commitKeys.map(col): _*).distinct(),
        commitKeys, "left_semi"),
      pmod(xxhash64(col("asset_id")), lit(IndexStore.Buckets.toLong)),
      Seq(col("asset_id"))) ++
      IndexStore.stageRows(store, kind, stagedBandRows)
    if (adds.nonEmpty)
      store.commit(adds, meta = IndexStore.formatMeta(kind) ++
        batchId.map(id => batchIdKey(kind) -> id.toString).toMap)
    if (!collectStats) None
    else {
      val batchAssets =
        batch.select(col("asset_id")).distinct().count()
      val hashedAssets =
        hashes.select(col("asset_id")).distinct().count()
      val nExact = exact.select(col("asset_id")).distinct().count()
      val nIntra = intra.select(col("asset_id")).distinct().count()
      val nSurv = survivors.select(col("asset_id")).distinct().count()
      Some(GateStats(
        batchAssets = batchAssets,
        undecodedDropped = batchAssets - hashedAssets,
        exactDropped = hashedAssets - nExact,
        intraDropped = nExact - nIntra,
        crossDropped = nIntra - nSurv,
        survivors = nSurv,
        cappedBandRows = allBandRows.count() - stagedBandRows.count()))
    }
  }
}
