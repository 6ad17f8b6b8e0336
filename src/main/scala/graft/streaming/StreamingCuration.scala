package graft.streaming

import graft.operators.{CorpusOps, DedupOps, TextOps}
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

  /** The running band index as an at-rest parquet table: the batch
    * schema of [[DedupOps.buildBandIndex]] (doc_id, band, band_key,
    * mh_arr, sh_hashes). Missing directory = empty index (first batch of
    * a fresh pipeline), derived from the library builder on an empty
    * corpus so the schema can never drift from the batch path. */
  def readIndex(spark: SparkSession, indexDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) spark.read.parquet(indexDir)
    else DedupOps.buildBandIndex(
      spark.range(0).selectExpr("id AS doc_id", "CAST(NULL AS STRING) AS text"))
  }

  /** The full streaming curate pipeline — the reference's
    * backfill-then-tail shape applied to the corpus: a streaming
    * (doc_id, text) frame is driven through [[curateBatch]] per
    * micro-batch; survivors append to `acceptedDir` and their index rows
    * to `indexDir`, BOTH at-rest parquet tables, so the pipeline resumes
    * across process restarts without re-shingling history (the band
    * index is the only state, and it is persisted — no in-memory var to
    * lose). Terminal [[exportShards]] turns the accepted set into
    * trainer shards.
    *
    * Scale shape per batch: one text scan of the BATCH (quality + fp +
    * signatures), a probe join against only matching (band, band_key)
    * buckets of the persisted index, and two appends. History is never
    * rescanned; the index read is a parquet scan of 8-byte-hash rows
    * (at 100 TB, bucket the index table by (band, band_key) so the probe
    * join co-locates without a shuffle of the index side). */
  def runToAccepted(
      stream: DataFrame,
      acceptedDir: String,
      indexDir: String,
      checkpointDir: String,
      qualityFloorBp: Long = 3000L,
      threshold: Double = 0.4): StreamingQuery =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val (survivors, newRows) =
          curateBatch(batch, readIndex(spark, indexDir),
            qualityFloorBp, threshold)
        survivors.select(col("doc_id"), col("text"), col("quality_bp"))
          .write.mode("append").parquet(acceptedDir)
        newRows.write.mode("append").parquet(indexDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Shard export over the accepted set — the same
    * [[CorpusOps.writeShards]] the batch `curate` verb ends with, so a
    * corpus curated incrementally and one curated in a single batch
    * produce IDENTICAL shards for the same survivor set (shard
    * membership is a pure function of doc_id). Returns the shard
    * count. */
  def exportShards(spark: SparkSession, acceptedDir: String,
      outDir: String,
      docsPerShard: Long = CorpusOps.DocsPerShard): Long =
    CorpusOps.writeShards(
      spark.read.parquet(acceptedDir).select("doc_id", "text"),
      outDir, docsPerShard)
}
