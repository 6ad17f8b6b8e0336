package graft.etl

import graft.chain.{ChainFixture, ChainOps}
import graft.store.GraftStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch access to chain data by height range (OP-SRC-2/3): the test/dev
  * implementation replays the deterministic fixture; a production
  * implementation fetches over RPC with one partition per height range
  * (`mapPartitions` fan-out replacing the reference's tokio::spawn pool,
  * etl.rs:286-303). */
trait ChainSource {
  def tipHeight(spark: SparkSession): Long
  def blocks(spark: SparkSession, from: Long, to: Long): DataFrame
  def transactions(spark: SparkSession, from: Long, to: Long): DataFrame
  def receipts(spark: SparkSession, from: Long, to: Long): DataFrame
}

/** Fixture-backed source; `forkAt` switches heights >= fork to the fork
  * branch (reorg scenarios, FIXTURES.md §B). */
final class FixtureSource(
    fx: ChainFixture.Fixture,
    forkAt: Option[Long] = None,
    forkLen: Int = 6) extends ChainSource {

  private def forkBlocksDF(spark: SparkSession) = {
    import spark.implicits._
    ChainFixture.forkBlocks(fx, forkAt.get.toInt, forkLen).toDF()
  }

  override def tipHeight(spark: SparkSession): Long = forkAt match {
    case Some(f) => f + forkLen - 1
    case None => fx.blocks.last.number
  }

  override def blocks(spark: SparkSession, from: Long, to: Long): DataFrame = {
    val canonical = fx.blocksDF(spark)
    val all = forkAt match {
      case Some(f) =>
        canonical.filter(col("number") < f).unionByName(forkBlocksDF(spark))
      case None => canonical
    }
    all.filter(col("number") >= from && col("number") <= to)
  }

  override def transactions(spark: SparkSession, from: Long, to: Long): DataFrame = {
    val txs = fx.txsDF(spark)
      .filter(col("block_number") >= from && col("block_number") <= to)
    forkAt match {
      // fork branch carries no transactions in the fixture
      case Some(f) => txs.filter(col("block_number") < f)
      case None => txs
    }
  }

  override def receipts(spark: SparkSession, from: Long, to: Long): DataFrame =
    fx.receiptsDF(spark)
}

/** Batch backfill (OP-SRC-3 / OP-STR-1, etl.rs:251-336): resume from the
  * store's coalesced max height, ingest [resume+1, tip] as ONE atomic
  * multi-table commit. Idempotent: re-running after a crash that staged
  * but never committed leaves no visible change. */
object Backfill {

  /** Resume cursor (OP-AGG-2, sqlite3.rs:153-211). Fast path: the `tip`
    * snapshot metadata, committed atomically with every ingest/rollback —
    * an O(1) driver read instead of three table scans per streaming head
    * (the materialized form of the reference's MAX(number) cursor).
    * Fallback for stores without the key: coalesced max across blocks,
    * else transactions, else transfers, else -1. */
  def maxIngestedHeight(spark: SparkSession, store: GraftStore): Long =
    store.currentMeta().get(store.metaKey("tip")) match {
      case Some(t) => t.toLong
      case None =>
        val b = store.read(spark, "blocks").agg(max("number")).head().get(0)
        val t = store.read(spark, "transactions").agg(max("block_number"))
          .head().get(0)
        val tr = store.read(spark, "token_transfers").agg(max("block_number"))
          .head().get(0)
        Seq(b, t, tr).collectFirst { case n: Long => n }.getOrElse(-1L)
    }

  /** Ingest heights [from, to] from the source. Returns ingested count.
    *
    * `watchTokens` maps contract type → watched addresses (reference
    * `--watch-tokens`, export.rs:88-114); each type dispatches to its
    * [[graft.chain.ContractRegistry]] decoder and the per-type extractions
    * union into one transfers table. `modules` gates which tables are
    * written at all (reference `--modules`, main.rs:52-54): a
    * transfers-only run stages no blocks/transactions leaves. */
  def run(
      spark: SparkSession,
      source: ChainSource,
      store: GraftStore,
      from: Long,
      to: Long,
      watchTokens: Map[String, Seq[String]] = WatchTokens.Default,
      addressFilter: Seq[String] = Nil,
      modules: Seq[String] = Seq("blocks", "transactions", "token_transfers"))
    : Long = {
    if (to < from) return 0L
    val wantTxs = modules.contains("transactions")
    val wantTransfers =
      modules.contains("token_transfers") && watchTokens.nonEmpty
    val blocks = source.blocks(spark, from, to)
    val txsRaw =
      if (wantTxs || wantTransfers) source.transactions(spark, from, to)
      else null
    val txLeaves =
      if (wantTxs)
        store.stage("transactions", ChainOps.addressFilter(
          ChainOps.normalizeTxs(txsRaw), addressFilter))
      else Nil
    // transfers are extracted from UNFILTERED txs (etl.rs:193-204: the
    // address filter applies to the transactions table only)
    val transferLeaves =
      if (wantTransfers) {
        val norm = ChainOps.normalizeTxs(txsRaw)
        val receipts = source.receipts(spark, from, to)
        val transfers = watchTokens.toSeq.sortBy(_._1)
          .map { case (ctype, addrs) =>
            ChainOps.tokenTransfers(norm, blocks, receipts, addrs, ctype)
          }
          .reduce(_.unionByName(_))
        store.stage("token_transfers", transfers)
      } else Nil
    val blockLeaves =
      if (modules.contains("blocks")) store.stage("blocks", blocks) else Nil
    store.commit(blockLeaves ++ txLeaves ++ transferLeaves,
      meta = Map("tip" -> to.toString))
    to - from + 1
  }
}
