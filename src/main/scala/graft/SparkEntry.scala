package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.chain.ChainQueries
import graft.operators.{AudioDedupOps, CorpusOps, CurationOps, DedupOps, ExtendedOps, ImageDedupOps, LayoutOps, MultimodalOps, PairedDedupOps, RelationalOps, SimilarityOps, SkewOps, TemporalOps, TextOps, VideoDedupOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All declared engine queries, one per operator (SURVEY.md §2). */
  def allQueries: Seq[GraftQuery] =
    RelationalOps.all ++ ChainQueries.all ++ TextOps.all ++ DedupOps.all ++
      SimilarityOps.all ++ MultimodalOps.all ++ ImageDedupOps.all ++
      AudioDedupOps.all ++ VideoDedupOps.all ++ PairedDedupOps.all ++
      ExtendedOps.all ++
      CurationOps.all ++ TemporalOps.all ++ CorpusOps.all ++ LayoutOps.all ++
      SkewOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalOps.q1Agg.fn(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(_.tuple).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(gq => gq.oracle.map(gq.name -> _)).toMap
}
