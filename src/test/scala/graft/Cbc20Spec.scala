package graft

import graft.functions.{Cbc20, U256}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Decoder vectors from the reference's own documented examples
  * (cbc20.rs:40, cbc20.rs:47-58, cbc20.rs:72) + safety properties
  * (seeded random sweeps). */
class Cbc20Spec extends AnyFunSuite {

  private val addrA = "ab416902d2548d52352a05423d13266ee7aaf140a068".take(44)
  private val addrB = "ab7153b962840676c37ba604c7816b0967cdb645cc54".take(44)

  test("transfer(address,uint256) — reference example cbc20.rs:40") {
    // 4b40e901 + 20 zeros + 44-char address + 64-char value
    val input = "4b40e901" +
      "00000000000000000000" + addrA +
      "0000000000000000000000000000000000000000000000000000000000000001"
    val rows = Cbc20.decode("sender-addr", input)
    assert(rows == Seq((0L, "sender-addr", addrA, "0" * 63 + "1")))
  }

  test("transferFrom(address,address,uint256) — cbc20.rs:72") {
    val input = "31f2e679" +
      "00000000000000000000" + addrA +
      "00000000000000000000" + addrB +
      "0000000000000000000000000000000000000000000000000000000000000005"
    val rows = Cbc20.decode("ignored-sender", input)
    assert(rows == Seq((0L, addrA, addrB, "0" * 63 + "5")))
  }

  test("batchTransfer — worked example layout cbc20.rs:47-58") {
    val input = "e86e7c5f" +
      "0000000000000000000000000000000000000000000000000000000000000040" +
      "00000000000000000000000000000000000000000000000000000000000000a0" +
      "0000000000000000000000000000000000000000000000000000000000000002" +
      "00000000000000000000" + addrA +
      "00000000000000000000" + addrB +
      "0000000000000000000000000000000000000000000000000000000000000002" +
      "0000000000000000000000000000000000000000000000000000000000000001" +
      "0000000000000000000000000000000000000000000000000000000000000001"
    val rows = Cbc20.decode("s", input)
    assert(rows == Seq(
      (0L, "s", addrA, "0" * 63 + "1"),
      (1L, "s", addrB, "0" * 63 + "1")))
  }

  test("near-miss selector and short calldata yield no rows") {
    assert(Cbc20.decode("s", "4b40e902" + "0" * 128).isEmpty)
    assert(Cbc20.decode("s", "4b40e901" + "0" * 10).isEmpty)
    assert(Cbc20.decode("s", "").isEmpty)
    assert(Cbc20.decode("s", null).isEmpty)
  }

  test("hostile batch count cannot allocate unbounded rows") {
    val input = "e86e7c5f" + "0" * 128 +
      "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
      "0" * 128
    assert(Cbc20.decode("s", input).isEmpty)
  }

  test("decode never mis-slices on random hex calldata (property)") {
    val rnd = new Random(42)
    def randHex(n: Int) =
      (0 until n).map(_ => "0123456789abcdef"(rnd.nextInt(16))).mkString
    for (_ <- 0 until 500) {
      val s = randHex(rnd.nextInt(600))
      val rows = Cbc20.decode("s", s) // must not throw
      rows.foreach { case (_, _, to, v) =>
        assert(to.length == 44 && v.length == 64)
      }
    }
    // and with a forced valid selector prefix over random tails
    for (sel <- Cbc20.Selectors; _ <- 0 until 200) {
      val s = sel + randHex(rnd.nextInt(600))
      Cbc20.decode("s", s).foreach { case (_, _, to, v) =>
        assert(to.length == 44 && v.length == 64)
      }
    }
  }

  test("U256 hex→dec round trip (property)") {
    val rnd = new Random(7)
    for (_ <- 0 until 1000) {
      val hex = (0 until 1 + rnd.nextInt(64))
        .map(_ => "0123456789abcdef"(rnd.nextInt(16))).mkString
      val dec = U256.hexToDec(UTF8String.fromString(hex)).toString
      assert(BigInt(dec) == BigInt(hex, 16))
    }
  }

  test("U256 decimal compare == BigInt compare (property)") {
    val rnd = new Random(11)
    def randDec() =
      (0 until 1 + rnd.nextInt(78)).map(_ => rnd.nextInt(10)).mkString
    for (_ <- 0 until 2000) {
      val (a, b) = (randDec(), randDec())
      val got = U256.decCompare(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(Integer.signum(got) == BigInt(a).compare(BigInt(b)))
    }
  }
}
