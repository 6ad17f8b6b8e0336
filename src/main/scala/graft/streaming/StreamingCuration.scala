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

  def curateBatch(
      batch: DataFrame,
      index: DataFrame,
      qualityFloorBp: Long = 3000L,
      threshold: Double = 0.4): (DataFrame, DataFrame) = {
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
    (survivors,
      DedupOps.buildBandIndex(survivors.select(col("doc_id"), col("text"))))
  }

  /** Manifest table holding the accepted (curated) documents. */
  val AcceptedTable = "curated_docs"

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
    * The single commit is what makes the pipeline EXACTLY-ONCE under
    * foreachBatch's replay semantics: a reader can never observe an
    * accepted doc without its index rows (or vice versa), and a replayed
    * batch — foreachBatch re-runs a batch whose epoch didn't commit —
    * self-matches against the index rows its first run committed
    * (jaccard 1 on identical docs), so every doc drops in the
    * cross-batch gate and the replay commits nothing. With the old
    * two-append form, a crash between the appends left the accepted
    * table ahead of the index, and the replay double-accepted the
    * batch. */
  def processBatch(
      store: GraftStore,
      batch: DataFrame,
      qualityFloorBp: Long = 3000L,
      threshold: Double = 0.4,
      exactSpans: Boolean = false): Unit = {
    val spark = batch.sparkSession
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
    // Replay determinism: the probe EXCLUDES the batch's own doc_ids
    // from the index (a replayed batch sees exactly the first run's
    // history, cuts identically, and then self-matches in the
    // whole-doc cross-batch gate — nothing commits twice). Extents
    // duplicated only WITHIN the batch are the batch operator's job,
    // exactly like the incremental removal operator documents.
    val cleaned =
      if (!exactSpans ||
          store.leavesOf(IndexStore.tableOf("espan")).isEmpty)
        batch.select(col("doc_id"), col("text"))
      else DedupOps.cutSpans(
        batch.select(col("doc_id"), col("text")),
        IndexStore.searchExactSpansAtRest(store, spark,
          batch.select(col("doc_id"), col("text")), AcceptedTable,
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
    val (survivors, newRows) =
      curateBatch(cleaned, idx, qualityFloorBp, threshold)
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
         else Map.empty[String, String]))
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
      exactSpans: Boolean = false): StreamingQuery =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(store, batch, qualityFloorBp, threshold, exactSpans)
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
