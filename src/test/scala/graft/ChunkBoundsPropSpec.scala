package graft

import graft.operators.AudioDedupOps
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for [[AudioDedupOps.chunkBounds]] — the long-audio
  * chunker every afp verdict, at-rest row, and streaming-gate
  * self-match rides on. AudioDedupSpec pins named shapes; these
  * properties check the full contract on arbitrary lengths: exact
  * cover of [0, n), every chunk within the overflow guard and at least
  * one fingerprint grid long, consecutive chunks overlapping EXACTLY
  * one fingerprint-cell width (the duplicated-region coverage
  * argument needs no less; the shuffle-volume argument wants no
  * more), monotone bounds, and the single-chunk reduction for short
  * clips. Pure driver-side arithmetic — thousands of lengths cost
  * nothing. */
class ChunkBoundsPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(2000), p)
    assert(r.passed, r.status.toString)
  }

  private val genLen: Gen[Int] = Gen.oneOf(
    // the interesting seams: around the guard, around multiples of the
    // stride, and uniform across several orders of magnitude
    Gen.choose(AudioDedupOps.MinSamples, 4 * AudioDedupOps.MaxSamples),
    Gen.choose(1, 8).flatMap(m => Gen.choose(-3, 3)
      .map(d => m * AudioDedupOps.MaxSamples + d)),
    Gen.choose(1, 8).flatMap(m => Gen.choose(-3, 3)
      .map(d => m * AudioDedupOps.ChunkStride + d)),
    Gen.choose(AudioDedupOps.MinSamples, 64 * AudioDedupOps.MaxSamples)
  ).suchThat(_ >= AudioDedupOps.MinSamples)

  test("cover + guard + exact overlap + monotonicity, for arbitrary " +
      "clip lengths") {
    check(Prop.forAll(genLen) { n =>
      val bs = AudioDedupOps.chunkBounds(n)
      val cover = bs.head._1 == 0 && bs.last._2 == n
      // every chunk must fit the overflow guard AND be long enough to
      // fingerprint on its own (>= MinSamples — a chunk afp64 would
      // reject means chunking silently dropped valid samples)
      val guarded = bs.forall { case (lo, hi) =>
        hi - lo <= AudioDedupOps.MaxSamples &&
          hi - lo >= AudioDedupOps.MinSamples }
      val overlaps = bs.zip(bs.tail).forall { case ((_, hi), (lo2, _)) =>
        hi - lo2 == AudioDedupOps.ChunkOverlap }
      val monotone = bs.zip(bs.tail).forall { case ((lo, _), (lo2, _)) =>
        lo < lo2 }
      val short = n > AudioDedupOps.MaxSamples || bs == Seq((0, n))
      cover && guarded && (n <= AudioDedupOps.MaxSamples || overlaps) &&
        monotone && short
    })
  }

  test("bounds are a pure function of n: a length-preserving " +
      "transform chunks identically (same object on repeated calls)") {
    check(Prop.forAll(genLen) { n =>
      AudioDedupOps.chunkBounds(n) == AudioDedupOps.chunkBounds(n)
    })
  }
}
