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

  /** Blocks AND transactions of a range from ONE fetch. The default
    * simply pairs the two single-table methods — free for local sources
    * (fixture, parquet replay). Wire-backed sources override it to
    * decode both tables from a single `getBlockByNumber(full)` pass
    * (the reference fetches each block exactly once and reads headers
    * and bodies from the same response, etl.rs:186-207). Callers must
    * invoke `release()` once every consuming action has run. */
  def fetchRange(spark: SparkSession, from: Long, to: Long)
      : ChainSource.RangeFetch =
    ChainSource.RangeFetch(blocks(spark, from, to),
      transactions(spark, from, to), () => ())

  /** Receipts for exactly the given transaction hashes (a one-column
    * DataFrame). The default ignores the hash set — a local source's
    * receipts cost nothing to over-deliver, and the consuming join
    * selects by hash anyway. Wire-backed sources override it to fetch
    * per listed hash only: the reference looks up receipts per MATCHING
    * tx (etl.rs:353-360), so receipt round-trips must scale with the
    * selector hit count, not the chain's tx count. */
  def receiptsFor(spark: SparkSession, from: Long, to: Long,
      txHashes: DataFrame): DataFrame =
    receipts(spark, from, to)
}

object ChainSource {
  /** One materialized range fetch; `release` frees any backing cache. */
  final case class RangeFetch(
      blocks: DataFrame,
      transactions: DataFrame,
      release: () => Unit)
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
    // One wire pass serves every staged table (each `stage` is its own
    // Spark job — the source materializes the range once behind
    // fetchRange). A blocks-only run skips tx bodies entirely.
    val fetch =
      if (wantTxs || wantTransfers) source.fetchRange(spark, from, to)
      else ChainSource.RangeFetch(source.blocks(spark, from, to), null,
        () => ())
    try {
      val blocks = fetch.blocks
      val txsRaw = fetch.transactions
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
          // receipts per MATCHING tx only (etl.rs:353-360): the OP-FIL-8
          // selector runs engine-side over the already-fetched txs and
          // only the hits' hashes reach the receipt lookup
          val matching = watchTokens.toSeq.sortBy(_._1)
            .map { case (ctype, addrs) =>
              val d = graft.chain.ContractRegistry(ctype)
              norm.filter(col("to_addr").isin(addrs: _*) &&
                  d.isCall(col("input")))
                .select(col("hash"))
            }
            .reduce(_.unionByName(_)).distinct()
          val receipts = source.receiptsFor(spark, from, to, matching)
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
    } finally fetch.release()
    to - from + 1
  }
}
