package graft.streaming

import graft.operators.{DedupOps, ImageDedupOps, PairedDedupOps}
import graft.store.{GraftStore, IndexStore}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming curation gate for (image, caption) PAIRS — the
  * [[StreamingImages]] recipe under [[PairedDedupOps]]' conjunctive
  * policy: an incoming sample is dropped only when BOTH its image is a
  * perceptual near-dup (phash band probe) AND its caption is a
  * near-dup (char-3-gram Jaccard >= [[PairedDedupOps.CaptionJaccard]])
  * of something already in the batch or at rest. An image dup under a
  * genuinely different caption COMMITS — the caption is the
  * supervision signal, and the image-only gate
  * ([[StreamingImages]]) would wrongly drop it.
  *
  * Per micro-batch, the one-decode discipline throughout:
  *  1. decode+hash per partition, ONE pass;
  *  2. exact-SAMPLE collapse — identical (phash, caption) keeps the
  *     smallest pair_id (a flood of identical samples collapses
  *     linearly before any pair join);
  *  3. intra-batch conjunctive pair drop
  *     ([[PairedDedupOps.pairedFromHashes]] over the representatives);
  *  4. cross-batch: the banded `phash` probe yields IMAGE candidates
  *     from precomputed hashes; accepted captions are then fetched for
  *     the candidate ids ONLY — a manifest-bucket-pruned read of the
  *     accepted table, proportional to candidates, never a corpus
  *     scan — and the gram-Jaccard verify decides;
  *  5. survivors + their band rows commit in ONE atomic snapshot,
  *     band rows staged through [[DedupOps.truncateBuckets]] keyed on
  *     pair_id (every survivor keeps >= 1 at-rest row, so the replay
  *     self-match below can never be truncated away).
  *
  * EXACTLY-ONCE: the epoch cursor ([[PerceptualGate.batchIdKey]]
  * pattern, key `gate_batch_id_pair`) commits atomically with the
  * data — a replayed epoch that COMMITTED at least one row skips in
  * O(1) before the decode pass. An all-dropped epoch commits nothing
  * and leaves the cursor unmoved (the [[StreamingCuration]] stance:
  * the cursor only ever rides a data commit), so its replay re-pays
  * the decode+probe and re-drops — idempotent, not O(1). For
  * id-less direct callers the argument is content self-match, and for
  * pairs it is TOTAL: a redelivered sample image-matches itself at
  * Hamming 0 (one hash per pair — no coverage caveat) and
  * caption-matches at Jaccard 1 (identical strings; the gram kernel
  * emits >= 1 gram even for captions shorter than the gram width). */
object StreamingPairs {

  /** Manifest table holding accepted (pair_id, payload, caption) rows
    * ([[IndexStore.AcceptedPairsTable]] — shared with the at-rest
    * [[IndexStore.pairDupes]] report). */
  val AcceptedTable: String = IndexStore.AcceptedPairsTable

  /** Epoch-cursor meta key (see [[PerceptualGate.batchIdKey]]). */
  val BatchIdKey: String = PerceptualGate.batchIdKey("pair")

  private def bucketExpr(c: String) =
    pmod(xxhash64(col(c)), lit(IndexStore.Buckets.toLong))

  /** One micro-batch of (pair_id, payload, caption) rows: gate, then
    * commit survivors + their `phash` band rows atomically. Returns
    * [[PerceptualGate.GateStats]] when `collectStats` is on
    * (batchAssets counts PAIRS). */
  def processBatch(store: GraftStore, batch: DataFrame,
      collectStats: Boolean = false,
      batchId: Option[Long] = None): Option[PerceptualGate.GateStats] = {
    val spark = batch.sparkSession
    val committedEpoch = store.currentMeta()
      .get(store.metaKey(BatchIdKey)).map(_.toLong)
    if (batchId.exists(id => committedEpoch.exists(_ >= id)))
      return None // epoch already committed — skip, no decode
    val captions = batch.select(col("pair_id"), col("caption"))
    val hashes = ImageDedupOps.imageHashRows(
      batch.select(col("pair_id").as("asset_id"), col("payload")))
      .localCheckpoint() // ONE decode: collapse, pair join, probe, stage
    // 1. exact-SAMPLE collapse: identical (phash, caption) keeps the
    //    smallest pair_id — two narrow keyed exchanges, linear.
    val reps = hashes
      .join(captions.select(col("pair_id").as("asset_id"),
        col("caption")), "asset_id")
      .groupBy(col("phash"), col("caption"))
      .agg(min(col("asset_id")).as("asset_id"))
      .select(col("asset_id"))
    val exact = hashes.join(reps, Seq("asset_id"), "left_semi")
      .localCheckpoint()
    // 2. intra-batch conjunctive drop among representatives
    val intraLosers = PairedDedupOps.pairedFromHashes(exact,
      captions.join(reps.select(col("asset_id").as("pair_id")),
        Seq("pair_id"), "left_semi"))
      .select(col("id_b").as("asset_id")).distinct()
    val intra = exact.join(intraLosers, Seq("asset_id"), "left_anti")
      .localCheckpoint()
    // 3. cross-batch: image candidates from precomputed hashes, then
    //    the caption verify against accepted captions of candidate ids
    //    only (bucket-pruned read — candidates bound the cost)
    val crossLosers =
      if (store.leavesOf(IndexStore.tableOf("phash")).isEmpty)
        intra.select(col("asset_id")).limit(0)
      else {
        val cand = IndexStore.phashSearchFromHashes(store, spark, intra,
          ImageDedupOps.MaxHamming).localCheckpoint()
        val buckets = cand
          .select(bucketExpr("existing_id").as("b")).distinct()
          .collect().map(_.getLong(0)).toSet
        val pruned = store.leavesOf(AcceptedTable)
          .filter(l => buckets.contains(l.bucket))
        if (pruned.isEmpty) intra.select(col("asset_id")).limit(0)
        else {
          val exCaps = store.readLeaves(spark, AcceptedTable, pruned)
            .select(col("pair_id").as("existing_id"),
              graft.functions.Vec.char_gram_hashes(col("caption"), 3)
                .as("g_ex"))
          val newCaps = captions
            .select(col("pair_id").as("new_id"),
              graft.functions.Vec.char_gram_hashes(col("caption"), 3)
                .as("g_new"))
          cand.join(exCaps, "existing_id").join(newCaps, "new_id")
            .withColumn("inter", size(array_intersect(col("g_new"),
              col("g_ex"))).cast("long"))
            .withColumn("uni", size(array_union(col("g_new"),
              col("g_ex"))).cast("long"))
            .filter(col("inter").cast("double") / col("uni")
              >= PairedDedupOps.CaptionJaccard)
            .select(col("new_id").as("asset_id")).distinct()
        }
      }
    val survivors = intra.join(crossLosers, Seq("asset_id"), "left_anti")
      .localCheckpoint()
    // 4. atomic commit: survivors' full rows + truncated band rows +
    //    the epoch cursor, one snapshot
    val stagedBandRows = DedupOps.truncateBuckets(
      ImageDedupOps.bandRows(survivors),
      Seq("band", "band_key"), DedupOps.MaxBucketSize,
      Seq("asset_id"), Seq("asset_id")).localCheckpoint()
    val adds = store.stageKeyed(AcceptedTable,
      batch.join(survivors.select(col("asset_id").as("pair_id")),
        Seq("pair_id"), "left_semi"),
      bucketExpr("pair_id"), Seq(col("pair_id"))) ++
      IndexStore.stageRows(store, "phash", stagedBandRows)
    if (adds.nonEmpty)
      store.commit(adds, meta = IndexStore.formatMeta("phash") ++
        batchId.map(id => BatchIdKey -> id.toString).toMap)
    if (!collectStats) None
    else {
      val batchPairs = batch.select(col("pair_id")).distinct().count()
      val hashed = hashes.select(col("asset_id")).distinct().count()
      val nExact = exact.select(col("asset_id")).distinct().count()
      val nIntra = intra.select(col("asset_id")).distinct().count()
      val nSurv = survivors.select(col("asset_id")).distinct().count()
      val allBandRows = ImageDedupOps.bandRows(survivors).count()
      Some(PerceptualGate.GateStats(
        batchAssets = batchPairs,
        undecodedDropped = batchPairs - hashed,
        exactDropped = hashed - nExact,
        intraDropped = nExact - nIntra,
        crossDropped = nIntra - nSurv,
        survivors = nSurv,
        cappedBandRows = allBandRows - stagedBandRows.count()))
    }
  }

  /** The full pipeline: a streaming (pair_id, payload, caption) frame
    * driven through [[processBatch]] per micro-batch, the `phash`
    * index as the only image-side dedup state, captions at rest in the
    * accepted table — one atomic snapshot per batch, resumable across
    * restarts without re-decoding history. */
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
