package graft.chain

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic chain (FIXTURES.md §B): blocks, transactions,
  * receipts, plus *independently computed* golden token transfers.
  *
  * The calldata is assembled from chosen (from, to, value) intents, and the
  * golden transfers are derived from those same intents — NOT by running
  * the decoder — so decoder tests and DuckDB VALUES oracles are genuine
  * golden checks.
  *
  * Layouts follow the reference's worked examples
  * (`/root/reference/crates/contracts/cbc20/src/cbc20.rs:40-58,72-78`);
  * the watched address is the mainnet CTN preset
  * (`bin/core-etl/src/export.rs:99`).
  */
object ChainFixture {

  val Watched = "cb19c7acc4c292d2943ba23c2eaa5d9c5a6652a8710c"
  val ZeroHash: String = "0" * 64

  def addr(i: Int): String = f"cb$i%042x"

  private def sha(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  /** 32-byte word holding a 22-byte (44-hex-char) address. */
  private def addrWord(a: String): String = ("0" * 20) + a

  /** 32-byte word holding an unsigned value. */
  private def valWord(v: BigInt): String =
    String.format("%064x", v.bigInteger)

  def transferCalldata(to: String, value: BigInt): String =
    "4b40e901" + addrWord(to) + valWord(value)

  def transferFromCalldata(from: String, to: String, value: BigInt): String =
    "31f2e679" + addrWord(from) + addrWord(to) + valWord(value)

  def batchTransferCalldata(tos: Seq[String], values: Seq[BigInt]): String = {
    require(tos.length == values.length)
    val n = tos.length
    "e86e7c5f" + valWord(BigInt(64)) + valWord(BigInt(96 + 32 * n)) +
      valWord(BigInt(n)) + tos.map(addrWord).mkString +
      valWord(BigInt(n)) + values.map(valWord).mkString
  }

  final case class Fixture(
      blocks: Seq[Block],
      transactions: Seq[Transaction],
      receipts: Seq[Receipt],
      goldenTransfers: Seq[(TokenTransfer, Long)]) { // (transfer, block ts)

    def blocksDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      blocks.toDF()
    }
    def txsDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      transactions.toDF()
    }
    def receiptsDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      receipts.toDF()
    }
  }

  private def receiptOk(n: Int, i: Int): Boolean = (n + i) % 13 != 0

  /** Build an `n`-block chain. Per block: one plain value transfer, one
    * CBC-20-related tx (cycling transfer / batchTransfer / transferFrom /
    * near-miss selector / wrong-recipient), one contract creation
    * (`to_addr = ""` sentinel, transaction.rs:34). */
  def build(numBlocks: Int): Fixture = {
    val blocks = Vector.newBuilder[Block]
    val txs = Vector.newBuilder[Transaction]
    val receipts = Vector.newBuilder[Receipt]
    val golden = Vector.newBuilder[(TokenTransfer, Long)]
    var totalDifficulty = BigInt(0)

    for (n <- 0 until numBlocks) {
      val ts = 1700000000L + 10L * n
      val hash = sha(s"block-$n")
      val parent = if (n == 0) ZeroHash else sha(s"block-${n - 1}")
      val difficulty = BigInt(2).pow(70) + n
      totalDifficulty += difficulty

      def tx(i: Int, to: String, input: String, value: BigInt): Transaction =
        Transaction(sha(s"tx-$n-$i"), i.toString, hash, n.toLong, i.toLong,
          addr((n + i) % 20), to, value.toString, "21000", "1000000000",
          input)

      val status1 = if (receiptOk(n, 1)) 1 else 0
      val sender1 = addr((n + 1) % 20)
      val t1 = n % 5 match {
        case 0 =>
          val to = addr(n % 11)
          val v = BigInt(n + 1) * BigInt(10).pow(18)
          golden += ((TokenTransfer(n.toLong, sender1, to, valWord(v),
            sha(s"tx-$n-1"), Watched, 0L, status1), ts))
          tx(1, Watched, transferCalldata(to, v), BigInt(0))
        case 1 =>
          val count = 2 + (n % 2)
          val tos = (0 until count).map(j => addr((n + j) % 17))
          val vs = (0 until count).map(j => BigInt(n) * 1000 + j + 1)
          for (j <- 0 until count)
            golden += ((TokenTransfer(n.toLong, sender1, tos(j),
              valWord(vs(j)), sha(s"tx-$n-1"), Watched, j.toLong, status1),
              ts))
          tx(1, Watched, batchTransferCalldata(tos, vs), BigInt(0))
        case 2 =>
          val from = addr((n + 3) % 19)
          val to = addr((n + 7) % 19)
          val v = BigInt(n) * 7 + 5
          golden += ((TokenTransfer(n.toLong, from, to, valWord(v),
            sha(s"tx-$n-1"), Watched, 0L, status1), ts))
          tx(1, Watched, transferFromCalldata(from, to, v), BigInt(0))
        case 3 => // near-miss selector: must NOT decode (OP-FIL-8 negative)
          tx(1, Watched, "4b40e902" + addrWord(addr(1)) + valWord(BigInt(9)),
            BigInt(0))
        case _ => // right selector, wrong recipient: must NOT decode
          tx(1, addr(5), transferCalldata(addr(2), BigInt(n)), BigInt(0))
      }

      val blockTxs = Seq(
        tx(0, addr((n + 1) % 20), "", BigInt(10).pow(15) * (n + 1)),
        t1,
        tx(2, "", "60806040" + sha(s"code-$n"), BigInt(0)))

      blockTxs.foreach { t =>
        txs += t
        receipts += Receipt(t.hash,
          receiptOk(n, t.transaction_index.toInt))
      }

      blocks += Block(n.toLong, hash, parent, f"$n%016x", sha(s"uncles-$n"),
        "00" * 256, sha(s"txroot-$n"), sha(s"state-$n"), sha(s"rcpt-$n"),
        addr(n % 7), difficulty.toString, totalDifficulty.toString,
        "", 10000000L, 21000L * blockTxs.size, ts, blockTxs.size.toLong, 0)
    }
    Fixture(blocks.result(), txs.result(), receipts.result(), golden.result())
  }

  /** Fork branch for reorg tests: alternative blocks [from, from+len) built
    * on top of canonical block `from - 1` with distinct hashes. */
  def forkBlocks(base: Fixture, from: Int, len: Int): Seq[Block] = {
    var totalDifficulty =
      BigInt(base.blocks(from - 1).total_difficulty)
    (0 until len).map { k =>
      val n = from + k
      val ts = 1700000000L + 10L * n + 5
      val difficulty = BigInt(2).pow(70) + n + 1
      totalDifficulty += difficulty
      Block(n.toLong, sha(s"fork-$n"),
        if (k == 0) base.blocks(from - 1).hash else sha(s"fork-${n - 1}"),
        f"$n%016x", sha(s"uncles-f$n"), "00" * 256, sha(s"txroot-f$n"),
        sha(s"state-f$n"), sha(s"rcpt-f$n"), addr((n + 1) % 7),
        difficulty.toString, totalDifficulty.toString, "", 10000000L, 0L,
        ts, 0L, 0)
    }
  }

  // ---- oracle rendering (driver-side, for VALUES-literal DuckDB oracles) --

  private val tsFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)

  def tsLiteral(epochSeconds: Long): String =
    s"TIMESTAMP '${tsFmt.format(Instant.ofEpochSecond(epochSeconds))}'"

  private def sq(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Golden transfers as a DuckDB VALUES relation matching the engine's
    * token_transfers output schema. */
  def goldenTransfersValuesSql(fx: Fixture): String = {
    val rows = fx.goldenTransfers.map { case (t, ts) =>
      s"(${t.block_number}, ${sq(t.from_addr)}, ${sq(t.to_addr)}, " +
        s"${sq(t.value)}, ${sq(t.tx_hash)}, ${sq(t.address)}, " +
        s"${t.transfer_index}, ${tsLiteral(ts)}, ${t.status})"
    }
    "SELECT * FROM (VALUES " + rows.mkString(", ") +
      ") AS t(block_number, from_addr, to_addr, value, tx_hash, address, " +
      "transfer_index, created_at, status)"
  }
}
