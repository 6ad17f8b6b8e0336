package graft.streaming

import graft.operators.{DedupOps, TextOps}
import org.apache.spark.sql.DataFrame
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
}
