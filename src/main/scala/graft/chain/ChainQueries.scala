package graft.chain

import graft.GraftQuery
import graft.functions.U256.u256_from_hex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chain-domain entries for the driver's correctness gate.
  *
  * Each query builds the deterministic in-memory fixture
  * ([[ChainFixture]]) and runs a real chain operator over it; the oracle is
  * a DuckDB VALUES relation rendered from the fixture's *independently
  * computed* goldens — a genuine golden test of decode/join/window
  * semantics, hash-checked by the driver like every relational query.
  */
object ChainQueries {

  /** Fixture size for oracle queries: big enough to hit every selector
    * variant and batch size, small enough to keep VALUES SQL compact. */
  val OracleBlocks = 60

  private lazy val fx = ChainFixture.build(OracleBlocks)

  private def sq(s: String): String = "'" + s.replace("'", "''") + "'"

  private def values(
      cols: Seq[(String, String)], rows: Seq[Seq[String]]): String = {
    val sel = cols.map { case (c, t) => s"CAST($c AS $t) AS $c" }.mkString(", ")
    val colNames = cols.map(_._1).mkString(", ")
    s"SELECT $sel FROM (VALUES ${rows.map(_.mkString("(", ", ", ")")).mkString(", ")}) AS t($colNames)"
  }

  /** Full extraction pipeline: selector filter → generator decode →
    * receipt join → timestamp propagation. Negatives (near-miss selector,
    * wrong recipient) must yield no rows — their absence from the golden is
    * part of the check. */
  val tokenTransfersPipeline: GraftQuery = GraftQuery(
    "chain_token_transfers",
    (s, _) => ChainOps.tokenTransfers(
      fx.txsDF(s), fx.blocksDF(s), fx.receiptsDF(s)),
    Some(ChainFixture.goldenTransfersValuesSql(fx)))

  /** U256 hex→decimal on decoded values (custom codegen expression),
    * checked against BigInt decimals computed from the fixture intents. */
  val u256Decode: GraftQuery = GraftQuery(
    "chain_u256_values",
    (s, _) => ChainOps.tokenTransfers(
        fx.txsDF(s), fx.blocksDF(s), fx.receiptsDF(s))
      .select(col("tx_hash"), col("transfer_index"),
        u256_from_hex(col("value")).as("value_dec")),
    Some(values(
      Seq("tx_hash" -> "VARCHAR", "transfer_index" -> "BIGINT",
        "value_dec" -> "VARCHAR"),
      fx.goldenTransfers.map { case (t, _) =>
        Seq(sq(t.tx_hash), t.transfer_index.toString,
          sq(BigInt(t.value, 16).toString))
      })))

  /** OP-FIL-6/PRJ-1 view query over the pipeline output. */
  val addressTransfers: GraftQuery = {
    val target = ChainFixture.addr(3)
    GraftQuery(
      "chain_address_transfers",
      (s, _) => ChainOps.addressTransfers(
        ChainOps.tokenTransfers(fx.txsDF(s), fx.blocksDF(s), fx.receiptsDF(s)),
        target, TransferType.All),
      Some {
        val rows = fx.goldenTransfers.collect {
          case (t, _) if t.from_addr == target || t.to_addr == target =>
            Seq(sq(t.from_addr), sq(t.to_addr), sq(t.value), sq(t.tx_hash),
              sq(t.address))
        }
        values(Seq("from_addr" -> "VARCHAR", "to_addr" -> "VARCHAR",
          "value" -> "VARCHAR", "tx_hash" -> "VARCHAR",
          "address" -> "VARCHAR"), rows)
      })
  }

  /** Maturity recompute-on-read (OP-UPD-1): matured == number <= tip-5. */
  val maturity: GraftQuery = GraftQuery(
    "chain_maturity",
    (s, _) => ChainOps.withMaturity(fx.blocksDF(s))
      .select(col("number"), col("matured")),
    Some(values(
      Seq("number" -> "BIGINT", "matured" -> "INTEGER"),
      fx.blocks.map(b => Seq(b.number.toString,
        (if (b.number <= OracleBlocks - 1 - 5) 1 else 0).toString)))))

  /** OP-WIN-1 gap check over a gapped slice (every 7th height removed). */
  val gaps: GraftQuery = GraftQuery(
    "chain_gaps",
    (s, _) => ChainOps.continuityGaps(
      fx.blocksDF(s).filter(col("number") % 7 =!= 0)),
    Some {
      val kept = fx.blocks.map(_.number).filter(_ % 7 != 0)
      val rows = kept.zip(kept.drop(1)).collect {
        case (prev, cur) if cur != prev + 1 =>
          Seq(cur.toString, prev.toString)
      }
      values(Seq("number" -> "BIGINT", "prev_number" -> "BIGINT"), rows)
    })

  /** OP-WIN-2 identity check: with genesis removed, every position shifts. */
  val identity: GraftQuery = GraftQuery(
    "chain_identity_check",
    (s, _) => ChainOps.identityMismatches(
      fx.blocksDF(s).filter(col("number") > 0)),
    Some(values(
      Seq("number" -> "BIGINT", "expected" -> "BIGINT"),
      fx.blocks.map(_.number).filter(_ > 0)
        .map(n => Seq(n.toString, (n - 1).toString)))))

  /** Scale form of the identity check (per-bucket windows + cumulative
    * bucket offsets) against the SAME oracle — full-table `verify` runs
    * this one (no single-partition sort). */
  val identityScalable: GraftQuery = GraftQuery(
    "chain_identity_check_scalable",
    (s, _) => ChainOps.identityMismatchesScalable(
      fx.blocksDF(s).filter(col("number") > 0), 50L),
    Some(values(
      Seq("number" -> "BIGINT", "expected" -> "BIGINT"),
      fx.blocks.map(_.number).filter(_ > 0)
        .map(n => Seq(n.toString, (n - 1).toString)))))

  /** Contract-creation sentinel rows (to_addr = "", transaction.rs:34). */
  val sentinels: GraftQuery = GraftQuery(
    "chain_sentinels",
    (s, _) => fx.txsDF(s).filter(col("to_addr") === "")
      .select(col("hash"), col("block_number")),
    Some(values(
      Seq("hash" -> "VARCHAR", "block_number" -> "BIGINT"),
      fx.transactions.filter(_.to_addr.isEmpty)
        .map(t => Seq(sq(t.hash), t.block_number.toString)))))

  /** OP-DEL-2 tail rollback: keep numbers <= max-10. */
  val rollbackLast: GraftQuery = GraftQuery(
    "chain_rollback_last",
    (s, _) => {
      val (b, _, _) = ChainOps.rollbackLast(fx.blocksDF(s), fx.txsDF(s),
        ChainOps.tokenTransfers(fx.txsDF(s), fx.blocksDF(s),
          fx.receiptsDF(s)), 10)
      b.select(col("number"), col("hash"))
    },
    Some(values(
      Seq("number" -> "BIGINT", "hash" -> "VARCHAR"),
      fx.blocks.filter(_.number <= OracleBlocks - 1 - 10)
        .map(b => Seq(b.number.toString, sq(b.hash))))))

  /** OP-DEL-3 retention sweep on created_at. */
  val retention: GraftQuery = {
    val now = 1700000000L + 10L * OracleBlocks
    val keepSeconds = 200L
    GraftQuery(
      "chain_retention",
      (s, _) => ChainOps.retentionSweep(
          ChainOps.withCreatedAt(fx.blocksDF(s)), now, keepSeconds)
        .select(col("number")),
      Some(values(Seq("number" -> "BIGINT"),
        fx.blocks.filter(_.timestamp >= now - keepSeconds)
          .map(b => Seq(b.number.toString)))))
  }

  /** OP-FIL-2 point lookup parity on the chain schema. */
  val viewBlock: GraftQuery = GraftQuery(
    "chain_view_block",
    (s, _) => ChainOps.blockByNumber(fx.blocksDF(s), 42L)
      .select("number", "hash", "parent_hash", "miner", "difficulty",
        "timestamp", "transaction_count"),
    Some {
      val b = fx.blocks(42)
      values(
        Seq("number" -> "BIGINT", "hash" -> "VARCHAR",
          "parent_hash" -> "VARCHAR", "miner" -> "VARCHAR",
          "difficulty" -> "VARCHAR", "timestamp" -> "BIGINT",
          "transaction_count" -> "BIGINT"),
        Seq(Seq(b.number.toString, sq(b.hash), sq(b.parent_hash),
          sq(b.miner), sq(b.difficulty), b.timestamp.toString,
          b.transaction_count.toString)))
    })

  /** Exact U256 aggregation (custom TypedImperativeAggregate): total
    * transferred value per receipt status, beyond Decimal(38) range if
    * needed. Oracle computed with BigInt over the fixture intents. */
  val u256Sum: GraftQuery = GraftQuery(
    "chain_u256_sum",
    (s, _) => ChainOps.tokenTransfers(
        fx.txsDF(s), fx.blocksDF(s), fx.receiptsDF(s))
      .groupBy(col("status"))
      .agg(graft.functions.U256.u256_sum(
        graft.functions.U256.u256_from_hex(col("value"))).as("total_value")),
    Some {
      val byStatus = fx.goldenTransfers.groupBy(_._1.status).toSeq
        .map { case (st, ts) =>
          Seq(st.toString,
            sq(ts.map(t => BigInt(t._1.value, 16)).sum.toString))
        }
      values(Seq("status" -> "INTEGER", "total_value" -> "VARCHAR"), byStatus)
    })

  val all: Seq[GraftQuery] = Seq(
    tokenTransfersPipeline, u256Decode, addressTransfers, maturity, gaps,
    identity, identityScalable, sentinels, rollbackLast, retention,
    viewBlock, u256Sum)
}
