package graft

import graft.chain.{Block, Receipt, Transaction}
import graft.etl.RpcCodec
import org.json4s._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the wire ↔ engine codec, complementing
  * RpcSourceSpec's hand-written wire-literal pins: the pins fix the
  * CONVENTION at a handful of values (round-trip equality alone cannot
  * tell a convention from its own inverse — the tx-nonce bug survived a
  * round exactly that way); these properties then extend the checked
  * value space — arbitrary quantities, hashes, sentinels, uppercase
  * wire hex, odd-length inputs — across thousands of generated rows. */
class RpcCodecPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, r.status.toString)
  }

  // ---- generators: ENGINE-form values (what the store holds) ----------

  private val hexChars = "0123456789abcdef"
  private def hexStr(bytes: Int): Gen[String] =
    Gen.listOfN(bytes * 2, Gen.oneOf(hexChars.toSeq)).map(_.mkString)
  /** Decimal string of a non-negative BigInt up to 2^130 (beyond u128,
    * well into U256 territory). */
  private val decimal: Gen[String] = for {
    bits <- Gen.choose(0, 130)
    n <- Gen.choose(0L, Long.MaxValue)
  } yield (BigInt(n) << bits).toString

  private val genTx: Gen[Transaction] = for {
    hash <- hexStr(32)
    nonce <- decimal
    blockHash <- hexStr(32)
    blockNumber <- Gen.choose(0L, Int.MaxValue.toLong)
    txIndex <- Gen.choose(0L, 10000L)
    from <- hexStr(22) // Core addresses are 22 bytes
    to <- Gen.oneOf(hexStr(22), Gen.const("")) // "" = contract creation
    value <- decimal
    energy <- decimal
    energyPrice <- decimal
    input <- Gen.oneOf(hexStr(0), hexStr(4), hexStr(68))
  } yield Transaction(hash, nonce, blockHash, blockNumber, txIndex,
    from, to, value, energy, energyPrice, input)

  private val genBlock: Gen[Block] = for {
    number <- Gen.choose(0L, Int.MaxValue.toLong)
    hash <- hexStr(32)
    parent <- hexStr(32)
    nonce <- hexStr(8) // 8-byte hash-like field: stays hex on both sides
    uncles <- hexStr(32)
    bloom <- hexStr(256)
    txRoot <- hexStr(32)
    stateRoot <- hexStr(32)
    rcptRoot <- hexStr(32)
    miner <- hexStr(22)
    difficulty <- decimal
    totalDifficulty <- decimal
    extra <- Gen.oneOf(hexStr(0), hexStr(13))
    limit <- Gen.choose(0L, Long.MaxValue)
    used <- Gen.choose(0L, Long.MaxValue)
    ts <- Gen.choose(0L, 4102444800L)
  } yield Block(number, hash, parent, nonce, uncles, bloom, txRoot,
    stateRoot, rcptRoot, miner, difficulty, totalDifficulty, extra,
    limit, used, ts, 0L, 0)

  // ---- properties ------------------------------------------------------

  test("tx encode→decode is the identity on engine rows") {
    check(Prop.forAll(genTx) { t =>
      RpcCodec.decodeTx(RpcCodec.encodeTx(t)) == t
    })
  }

  test("block encode→decode is the identity (transaction_count derived " +
      "from the encoded tx array; matured always lands 0)") {
    check(Prop.forAll(genBlock, Gen.listOf(genTx)) { (b, txs) =>
      RpcCodec.decodeBlock(RpcCodec.encodeBlock(b, txs, full = true)) ==
        b.copy(transaction_count = txs.size.toLong, matured = 0)
    })
  }

  test("decodeTxs and txHashes agree with the encoded tx list, in both " +
      "full and hash-only forms") {
    check(Prop.forAll(genBlock, Gen.listOf(genTx)) { (b, txs) =>
      val full = RpcCodec.encodeBlock(b, txs, full = true)
      val slim = RpcCodec.encodeBlock(b, txs, full = false)
      // (decodeTxs is only defined on FULL-form blocks — the hash-only
      // array holds strings, and the codec is deliberately strict
      // rather than silently skipping a node that answered slim when
      // asked full; the fetch paths always pass full=true to it)
      RpcCodec.decodeTxs(full).toSeq == txs &&
        RpcCodec.txHashes(full).toSeq == txs.map(_.hash) &&
        RpcCodec.txHashes(slim).toSeq == txs.map(_.hash)
    })
  }

  test("receipt encode→decode is the identity") {
    check(Prop.forAll(hexStr(32), Gen.oneOf(true, false)) { (h, ok) =>
      RpcCodec.decodeReceipt(RpcCodec.encodeReceipt(Receipt(h, ok))) ==
        Receipt(h, ok)
    })
  }

  test("quantity codec: dec→hex→dec round-trips and hex case is " +
      "insensitive on decode") {
    check(Prop.forAll(decimal) { d =>
      RpcCodec.hexToDec(RpcCodec.decToHex(d)) == d &&
        RpcCodec.hexToDec(RpcCodec.decToHex(d).toUpperCase
          .replace("0X", "0x")) == d
    })
  }

  test("wire hex case-insensitivity: an uppercase-hex node answer " +
      "decodes to the same engine row as a lowercase one") {
    def upperHex(j: JValue): JValue = j match {
      case JString(s) if s.startsWith("0x") =>
        JString("0x" + s.drop(2).toUpperCase)
      case JObject(fields) =>
        JObject(fields.map { case (k, v) => (k, upperHex(v)) })
      case JArray(items) => JArray(items.map(upperHex))
      case other => other
    }
    check(Prop.forAll(genTx) { t =>
      RpcCodec.decodeTx(upperHex(RpcCodec.encodeTx(t))) == t
    })
    check(Prop.forAll(genBlock) { b =>
      RpcCodec.decodeBlock(upperHex(RpcCodec.encodeBlock(b, Nil,
        full = true))) == b.copy(transaction_count = 0L, matured = 0)
    })
  }
}
