package graft.streaming

import graft.operators.{CorpusOps, DedupOps, TextOps}
import graft.store.{GraftStore, IndexStore}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming corpus curation: the per-micro-batch step of a
  * readStream → curate → writeStream pipeline (drive it from
  * `foreachBatch`, the idiom the incremental dedup spec also uses).
  *
  * Each batch passes three gates:
  *  1. quality floor — the integer-basis-point score
  *     ([[TextOps.qualityBpSparkSql]]), a scan-stage expression;
  *  2. intra-batch dedup — exact (normalized-text fingerprint, keep min
  *     doc_id) then near-dup (banded MinHash pairs; every detected pair
  *     loses its LARGER id). The greedy larger-id drop is deliberately
  *     chosen over full transitive closure here: it guarantees the
  *     batch's survivors are pairwise non-duplicate in ONE pass, with no
  *     iterative jobs in the streaming hot path (at worst it drops a
  *     chain member a full closure would keep — conservative for
  *     curation);
  *  3. cross-batch dedup — [[DedupOps.incrementalNearDup]] probe against
  *     the running band index: history is NEVER re-shingled, the batch
  *     shuffles only against matching band buckets.
  *
  * Returns (survivors, index rows for the survivors). The caller appends
  * the new index rows to its running index (and persists them alongside
  * the curated output — at scale the index lives as a parquet table
  * bucketed by (band, band_key), exactly like the batch path persists
  * it), so later batches dedupe against everything accepted so far.
  */
object StreamingCuration {

  /** Per-batch audit counters for the TEXT gate — the
    * [[PerceptualGate.GateStats]] shape transposed (batch size, each
    * drop class in gate order — replayed-id backstop, quality floor,
    * exact, intra near-dup, cross near-dup — survivors, and how many
    * survivor band rows the at-rest truncation policy capped out), so
    * a text flood is as observable as a perceptual one. Opt-in
    * ([[processBatch]] `collectStats` / [[runToAccepted]] `onStats`):
    * the counts cost real per-batch actions, including one re-scan of
    * the batch text for the pre-gate stages, so the hot path leaves
    * them off. */
  final case class CurateStats(
      batchDocs: Long,
      replayDropped: Long,
      qualityDropped: Long,
      exactDropped: Long,
      intraDropped: Long,
      crossDropped: Long,
      survivors: Long,
      cappedIndexRows: Long)

  /** The staged frames of one [[curateBatch]] run — kept private so
    * the stage boundaries stay a single definition shared by the
    * two-frame public API and the stats-collecting path. */
  private final case class Staged(
      kept: DataFrame,
      exactKeep: DataFrame,
      intra: DataFrame,
      survivors: DataFrame,
      indexRows: DataFrame)

  private def stageBatch(
      batch: DataFrame,
      index: DataFrame,
      qualityFloorBp: Long,
      threshold: Double): Staged = {
    val kept = batch
      .withColumn("quality_bp", expr(TextOps.qualityBpSparkSql))
      .filter(col("quality_bp") >= qualityFloorBp)
    val exactKeep = kept
      .withColumn("fp", md5(regexp_replace(lower(col("text")), "\\s+", " ")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1).drop("fp", "rn")
    val intraLosers = DedupOps
      .minhashNearDupPairs(exactKeep.select(col("doc_id"), col("text")),
        threshold)
      .select(col("id_b").as("doc_id")).distinct()
    val intra = exactKeep.join(intraLosers, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val crossLosers = DedupOps
      .incrementalNearDup(intra.select(col("doc_id"), col("text")), index,
        threshold)
      .select(col("new_id").as("doc_id")).distinct()
    val survivors = intra.join(crossLosers, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    Staged(kept, exactKeep, intra, survivors,
      DedupOps.buildBandIndex(survivors.select(col("doc_id"), col("text"))))
  }

  def curateBatch(
      batch: DataFrame,
      index: DataFrame,
      qualityFloorBp: Long = 3000L,
      threshold: Double = 0.4): (DataFrame, DataFrame) = {
    val st = stageBatch(batch, index, qualityFloorBp, threshold)
    (st.survivors, st.indexRows)
  }

  /** Manifest table holding the accepted (curated) documents. */
  val AcceptedTable = "curated_docs"

  /** Snapshot-meta key holding the highest foreachBatch epoch this
    * store has committed — the transactional-sink idempotence cursor
    * (the Spark foreachBatch exactly-once recipe: write the epoch id
    * atomically WITH the data; skip epochs at or below it on replay).
    * One curate stream per store: two concurrent streams would race
    * the cursor (the same single-writer assumption the checkpoint
    * directory already imposes upstream). The cursor is meaningful
    * only within ONE checkpoint lineage — epochs restart at 0 under a
    * fresh checkpoint directory, so a NEW stream over an already-
    * curated store must resume the old checkpoint (the normal Spark
    * practice) or drive [[processBatch]] without a batchId (the
    * anti-join backstop path). */
  val BatchIdKey = "curate_batch_id"

  /** The running band index read from the store manifest: the batch
    * schema of [[DedupOps.buildBandIndex]] (doc_id, band, band_key,
    * mh_arr, sh_hashes). No leaves yet = empty index (first batch of a
    * fresh pipeline), derived from the library builder on an empty
    * corpus so the schema can never drift from the batch path. */
  def readIndex(store: GraftStore, spark: SparkSession): DataFrame =
    if (store.leavesOf(IndexStore.tableOf("band")).isEmpty)
      DedupOps.buildBandIndex(
        spark.range(0).selectExpr("id AS doc_id", "CAST(NULL AS STRING) AS text"))
    else IndexStore.read(store, spark, "band")

  /** One micro-batch of the streaming curate pipeline: [[curateBatch]]
    * against the at-rest band index, then the survivors AND their index
    * rows commit to the store in ONE atomic snapshot swap.
    *
    * EXACTLY-ONCE under foreachBatch's replay semantics is
    * DETERMINISTIC since round 17, by two complementary layers, because
    * the band self-match argument alone leaks: the probe side of
    * [[DedupOps.incrementalNearDup]] is bucket-CAPPED, so a replayed
    * 65+ same-bucket flood loses its own probe rows and self-matches
    * nothing (the r16 residual).
    *
    *  - With a `batchId` (the [[runToAccepted]] path): the epoch
    *    cursor. The id commits atomically WITH the data under
    *    [[BatchIdKey]]; a batch at or below the cursor is skipped
    *    outright — O(1), nothing scanned. Either the first run's
    *    commit landed (cursor advanced → replay skips) or it did not
    *    (cursor unmoved → the replay IS the first run). This is the
    *    standard Spark transactional-sink recipe, and it keeps the
    *    streaming hot path free of any per-batch corpus read.
    *  - Without a `batchId` (direct callers, custom drivers): a
    *    doc_id anti-join against the at-rest accepted table, before
    *    any gate. Manifest-bucket-pruned (the accepted table is keyed
    *    by xxhash64(doc_id) buckets), but a batch touching every
    *    bucket reads the accepted table's doc_id column — O(accepted
    *    rows in touched buckets) per call, fine for drivers and tests,
    *    NOT for a 100 TB hot path; that is what the cursor is for.
    *
    * The band self-match layer (jaccard 1 on identical docs) remains
    * for CONTENT redelivery under fresh ids/epochs. The single atomic
    * commit is the final ingredient: a reader can never observe an
    * accepted doc without its index rows (or vice versa) — with the
    * old two-append form, a crash between the appends left the
    * accepted table ahead of the index.
    *
    * Returns None when stats are off OR the batch was skipped by the
    * epoch cursor. */
  def processBatch(
      store: GraftStore,
      batch: DataFrame,
      qualityFloorBp: Long = 3000L,
      threshold: Double = 0.4,
      exactSpans: Boolean = false,
      collectStats: Boolean = false,
      batchId: Option[Long] = None): Option[CurateStats] = {
    val spark = batch.sparkSession
    val committedEpoch = store.currentMeta()
      .get(store.metaKey(BatchIdKey)).map(_.toLong)
    if (batchId.exists(id => committedEpoch.exists(_ >= id)))
      return None // this epoch's commit landed — replay skips, O(1)
    // the exactly-once ID backstop for id-LESS callers — replayed or
    // redelivered ids never reach the span cut or the gates. Pruned-
    // leaf read: only accepted-table leaves whose id-hash bucket
    // matches some batch id are listed. Skipped on the batchId path:
    // the epoch cursor already guarantees exactly-once there, and this
    // read is O(accepted rows in touched buckets) per call.
    val idGated =
      if (batchId.nonEmpty || store.leavesOf(AcceptedTable).isEmpty) batch
      else {
        val buckets = batch.select(
          pmod(xxhash64(col("doc_id")), lit(IndexStore.Buckets.toLong))
            .as("b")).distinct().collect().map(_.getLong(0)).toSet
        val pruned = store.leavesOf(AcceptedTable)
          .filter(l => buckets.contains(l.bucket))
        if (pruned.isEmpty) batch
        else batch.join(
          store.readLeaves(spark, AcceptedTable, pruned)
            .select(col("doc_id")),
          Seq("doc_id"), "left_anti")
      }
    // Turning exactSpans ON over a store with pre-existing accepted
    // docs: those docs predate the flag, so they have NO espan
    // postings — certifying against the partial index would silently
    // pass extents duplicated from them. One-time BACKFILL: build the
    // postings for everything accepted so far and commit them before
    // this batch runs (its own commit — if the batch's commit never
    // lands, a replay sees the postings at rest, skips this branch,
    // and cuts identically; if the backfill itself crashes mid-way,
    // the espan table is still empty and the next attempt rebuilds —
    // staged orphans are vacuum's job).
    if (exactSpans &&
        store.leavesOf(IndexStore.tableOf("espan")).isEmpty &&
        store.leavesOf(AcceptedTable).nonEmpty) {
      val backfill = IndexStore.stageRows(store, "espan",
        DedupOps.buildExactSpanIndex(
          store.read(spark, AcceptedTable)
            .select(col("doc_id"), col("text"))))
      if (backfill.nonEmpty)
        store.commit(backfill, meta = IndexStore.formatMeta("espan"))
    }
    // Optional exact-span stage (Lee et al. at ingest): BEFORE the
    // whole-doc gates, cut from each batch doc every extent that
    // already exists verbatim in the ACCEPTED corpus — the at-rest
    // espan postings certify (history never re-shingled; accepted text
    // fetched for candidate docs only), DedupOps.cutSpans rewrites.
    // The quality floor then judges the REMAINDER: a doc that is
    // mostly known boilerplate loses it here and stands on what is
    // left, which is the pipeline semantics span removal exists for.
    // Replay determinism: the ID backstop already removed replayed
    // ids; for the ids that remain the probe additionally EXCLUDES the
    // batch's own doc_ids from the index (belt and braces — a partial
    // redelivery sees exactly the first run's history and cuts
    // identically). Extents duplicated only WITHIN the batch are the
    // batch operator's job, exactly like the incremental removal
    // operator documents.
    val cleaned =
      if (!exactSpans ||
          store.leavesOf(IndexStore.tableOf("espan")).isEmpty)
        idGated.select(col("doc_id"), col("text"))
      else DedupOps.cutSpans(
        idGated.select(col("doc_id"), col("text")),
        IndexStore.searchExactSpansAtRest(store, spark,
          idGated.select(col("doc_id"), col("text")), AcceptedTable,
          excludeProbeIds = true))
        .drop("removed_tokens")
    // The cross-batch probe reads the index PRUNED for this batch's
    // band keys ([[IndexStore.prunedBandIndex]]: manifest bucket prune
    // + the In(band_key) scan filter), not the full index — reading it
    // whole put an index-sized shuffle inside every micro-batch (the
    // same defect the round-10 scale sweep caught in IndexStore.search;
    // this was its second call site). Pruning on the RAW batch's keys
    // is a superset of the post-gate survivors' keys, so results are
    // identical — candidate pairs require band_key equality either way.
    val idx =
      if (store.leavesOf(IndexStore.tableOf("band")).isEmpty)
        readIndex(store, spark) // empty-schema frame, first batch
      else IndexStore.prunedBandIndex(store, spark, cleaned)
    val st = stageBatch(cleaned, idx, qualityFloorBp, threshold)
    val (survivors, newRows) = (st.survivors, st.indexRows)
    val adds = store.stageKeyed(AcceptedTable,
      survivors.select(col("doc_id"), col("text"), col("quality_bp")),
      pmod(xxhash64(col("doc_id")), lit(IndexStore.Buckets.toLong)),
      Seq(col("doc_id"))) ++
      IndexStore.stageRows(store, "band", newRows) ++
      // espan postings of the survivors' CLEANED text (what the
      // accepted table holds), committed in the SAME snapshot — later
      // batches certify against everything accepted so far
      (if (exactSpans) IndexStore.stageRows(store, "espan",
        DedupOps.buildExactSpanIndex(
          survivors.select(col("doc_id"), col("text"))))
      else Nil)
    if (adds.nonEmpty)
      store.commit(adds, meta = IndexStore.formatMeta("band") ++
        (if (exactSpans) IndexStore.formatMeta("espan")
         else Map.empty[String, String]) ++
        // the epoch cursor rides THE data commit — it can never run
        // ahead of (or behind) the rows it makes idempotent. An
        // all-dropped batch commits nothing and leaves the cursor
        // unmoved; its replay re-processes and re-drops, harmlessly.
        batchId.map(id => BatchIdKey -> id.toString).toMap)
    if (!collectStats) None
    else {
      val batchDocs = batch.select(col("doc_id")).distinct().count()
      val gatedDocs = cleaned.select(col("doc_id")).distinct().count()
      val nKept = st.kept.count()
      val nExact = st.exactKeep.count()
      val nIntra = st.intra.count()
      val nSurv = survivors.count()
      // staged band rows vs the un-truncated explode: every survivor
      // with a signature (>= ShingleN tokens) explodes to Bands rows
      // before the at-rest truncation policy applies
      val sigDocs = survivors.filter(
        size(split(lower(col("text")), "\\s+")) >= DedupOps.ShingleN)
        .count()
      Some(CurateStats(
        batchDocs = batchDocs,
        replayDropped = batchDocs - gatedDocs,
        qualityDropped = gatedDocs - nKept,
        exactDropped = nKept - nExact,
        intraDropped = nExact - nIntra,
        crossDropped = nIntra - nSurv,
        survivors = nSurv,
        cappedIndexRows = sigDocs * DedupOps.Bands - newRows.count()))
    }
  }

  /** The full streaming curate pipeline — the reference's
    * backfill-then-tail shape applied to the corpus: a streaming
    * (doc_id, text) frame is driven through [[processBatch]] per
    * micro-batch; survivors and their band-index rows land in the store
    * manifest ([[AcceptedTable]] + the [[IndexStore]] band table), so
    * the pipeline resumes across process restarts without re-shingling
    * history (the band index is the only state, and it is committed
    * atomically with the docs it indexes — no in-memory var to lose, no
    * half-written pair of tables to resume from). Terminal
    * [[exportShards]] turns the accepted set into trainer shards.
    *
    * Scale shape per batch: one text scan of the BATCH (quality + fp +
    * signatures), a probe join against only matching (band, band_key)
    * buckets of the at-rest index (leaf-bucketed by band-key hash, so a
    * small batch manifest-prunes untouched leaves), and one commit. */
  def runToAccepted(
      stream: DataFrame,
      store: GraftStore,
      checkpointDir: String,
      qualityFloorBp: Long = 3000L,
      threshold: Double = 0.4,
      exactSpans: Boolean = false,
      onStats: Option[CurateStats => Unit] = None): StreamingQuery =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val stats = processBatch(store, batch, qualityFloorBp, threshold,
          exactSpans, collectStats = onStats.nonEmpty,
          batchId = Some(epoch))
        onStats.foreach(f => stats.foreach(f))
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Shard export over the accepted set — the same
    * [[CorpusOps.writeShards]] the batch `curate` verb ends with, so a
    * corpus curated incrementally and one curated in a single batch
    * produce IDENTICAL shards for the same survivor set (shard
    * membership is a pure function of doc_id). Returns the shard
    * count. */
  def exportShards(spark: SparkSession, store: GraftStore,
      outDir: String,
      docsPerShard: Long = CorpusOps.DocsPerShard): Long =
    CorpusOps.writeShards(
      store.read(spark, AcceptedTable).select("doc_id", "text"),
      outDir, docsPerShard)
}
