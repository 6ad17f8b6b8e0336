package graft.cli

import graft.GraftSession
import graft.chain.{ChainFixture, ChainOps, TransferType}
import graft.etl.{Backfill, FixtureSource}
import graft.store.GraftStore

import org.apache.spark.sql.SparkSession

/** CLI surface parity (SURVEY §2.12; reference `bin/core-etl/src/main.rs`):
  * `export` (ingest), `view` (read queries), `verify` (integrity checks),
  * over a [[GraftStore]] directory. The chain source is the deterministic
  * fixture (a production build points the same code at an RPC source).
  *
  * {{{
  * sbt "runMain graft.cli.Main export --store /tmp/g --blocks 200"
  * sbt "runMain graft.cli.Main view block --store /tmp/g --number 42"
  * sbt "runMain graft.cli.Main view token-transfer --store /tmp/g --from cb58..."
  * sbt "runMain graft.cli.Main verify blocks --store /tmp/g"
  * }}}
  */
object Main {

  private def opt(args: Array[String], name: String): Option[String] =
    args.sliding(2).collectFirst {
      case Array(k, v) if k == s"--$name" => v
    }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args)
    finally spark.stop()
  }

  private def run(spark: SparkSession, args: Array[String]): Unit = {
    val store = new GraftStore(
      opt(args, "store").getOrElse(sys.error("--store required")))
    args.headOption match {
      case Some("export") =>
        val n = opt(args, "blocks").map(_.toInt).getOrElse(200)
        val fx = ChainFixture.build(n)
        val resume = Backfill.maxIngestedHeight(spark, store)
        val ingested = Backfill.run(spark, new FixtureSource(fx), store,
          resume + 1, n - 1L,
          addressFilter = opt(args, "address-filter")
            .map(_.split(",").toSeq).getOrElse(Nil))
        println(s"[export] ingested $ingested blocks (resumed after $resume)")

      case Some("view") =>
        val blocks = store.read(spark, "blocks")
        val txs = store.read(spark, "transactions")
        val transfers = store.read(spark, "token_transfers")
        args.lift(1) match {
          case Some("block") =>
            val df = opt(args, "number")
              .map(n => ChainOps.blockByNumber(blocks, n.toLong))
              .orElse(opt(args, "hash").map(ChainOps.blockByHash(blocks, _)))
              .getOrElse(sys.error("--number or --hash required"))
            df.show(20, truncate = false)
          case Some("transaction") =>
            val df = opt(args, "block-number")
              .map(n => ChainOps.txsOfBlock(txs, n.toLong))
              .orElse(opt(args, "hash").map(ChainOps.txByHash(txs, _)))
              .getOrElse(sys.error("--block-number or --hash required"))
            df.show(20, truncate = false)
          case Some("token-transfer") =>
            val df = opt(args, "token-address") match {
              case Some(addr) => ChainOps.tokenTransfersOf(transfers, addr,
                opt(args, "from"), opt(args, "to"))
              case None =>
                val (a, tt) = (opt(args, "from"), opt(args, "to")) match {
                  case (Some(f), None) => (f, TransferType.From)
                  case (None, Some(t)) => (t, TransferType.To)
                  case (Some(f), _) => (f, TransferType.All)
                  case _ => sys.error("--token-address, --from or --to required")
                }
                ChainOps.addressTransfers(transfers, a, tt)
            }
            df.show(20, truncate = false)
          case other => sys.error(s"unknown view target: $other")
        }

      case Some("verify") =>
        val blocks = store.read(spark, "blocks")
        val slice = opt(args, "block") match {
          case Some(b) => ChainOps.blocksInRange(blocks, b.toLong, -1L)
          case None => blocks
        }
        val gaps = ChainOps.continuityGaps(slice).count()
        val idMismatch =
          if (opt(args, "block").isEmpty)
            ChainOps.identityMismatches(blocks).count()
          else 0L
        if (gaps == 0 && idMismatch == 0) println("[verify] blocks OK")
        else sys.error(s"[verify] FAILED: $gaps gaps, $idMismatch identity mismatches")
        // `verify transactions` is a documented no-op stub in the
        // reference (verify.rs:92) — parity preserved.

      case other => sys.error(s"usage: export|view|verify ... (got $other)")
    }
  }
}
