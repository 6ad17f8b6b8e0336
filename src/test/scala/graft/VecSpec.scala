package graft

import graft.functions.Vec
import graft.functions.Vec.{hamming64, sign_sketch, vec_dot, vec_unit}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd vector kernels vs the higher-order-function formulations
  * they replaced: unit/dot agree to ~1e-9 (the kernels keep every product
  * in double; the HOF forms squared float elements in float first), and
  * the integer kernels (hamming) are exactly equal. The oracled queries
  * built on these emit ranks or 3-dp-rounded values, far above the noise. */
class VecSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  private def emb = Tables.t(spark, dir, "embeddings")

  override def afterAll(): Unit = spark.stop()

  test("vec_unit matches the HOF normalization to 1e-6") {
    val both = emb
      .withColumn("norm",
        sqrt(expr("aggregate(embedding, 0D, (acc, x) -> acc + x * x)")))
      .filter(col("norm") > 0)
      .withColumn("hof", expr("transform(embedding, x -> x / norm)"))
      .withColumn("kernel", vec_unit(col("embedding")))
      .select("vec_id", "hof", "kernel").collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (h, k) = (r.getSeq[Double](1), r.getSeq[Double](2))
      assert(h.size == k.size, s"vec ${r.getLong(0)}")
      h.zip(k).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-6, s"vec ${r.getLong(0)}: $a vs $b")
      }
    }
  }

  test("vec_dot matches aggregate(zip_with) to 1e-6 on unit vectors") {
    val u = emb.withColumn("unit", vec_unit(col("embedding")))
      .filter(col("unit").isNotNull).limit(50)
    val pairs = u.select(col("vec_id").as("ida"), col("unit").as("ua"))
      .crossJoin(u.select(col("vec_id").as("idb"), col("unit").as("ub")))
      .filter(col("ida") < col("idb"))
      .withColumn("hof", expr(
        "aggregate(zip_with(ua, ub, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"))
      .withColumn("kernel", vec_dot(col("ua"), col("ub")))
      .select("hof", "kernel").collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6))
  }

  test("hamming64 matches bit_count(xor) aggregation") {
    val sk = emb.withColumn("unit", vec_unit(col("embedding")))
      .filter(col("unit").isNotNull)
      .withColumn("sk", sign_sketch(col("unit"), 42L, 256)).limit(20)
    val pairs = sk.select(col("vec_id").as("ida"), col("sk").as("a"))
      .crossJoin(sk.select(col("vec_id").as("idb"), col("sk").as("b")))
      .filter(col("ida") < col("idb"))
      .withColumn("hof", expr(
        "aggregate(zip_with(a, b, (x, y) -> bit_count(x ^ y)), 0, (acc, v) -> acc + v)"))
      .withColumn("kernel", hamming64(col("a"), col("b")))
      .select("hof", "kernel").collect()
    pairs.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("sign_sketch is deterministic and plane cache is seed-stable") {
    val a = emb.withColumn("unit", vec_unit(col("embedding")))
      .filter(col("unit").isNotNull)
      .withColumn("sk", sign_sketch(col("unit"), 42L, 256))
      .select("vec_id", "sk").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = emb.withColumn("unit", vec_unit(col("embedding")))
      .filter(col("unit").isNotNull)
      .withColumn("sk", sign_sketch(col("unit"), 42L, 256))
      .select("vec_id", "sk").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b)
    assert(a.values.forall(_.length == 4))
    // the generator itself is reproducible
    val p1 = Vec.planes(42L, 256, 64)
    val p2 = Vec.planes(42L, 256, 64)
    assert(p1 eq p2) // cached
    // independent recompute of the portable Rademacher derivation:
    // entry (i, j) = popcount parity of the pair-hash of "seed:i:j"
    val firstPlane = Array.tabulate(64) { j =>
      val h = Vec.portableHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"42:0:$j"))
      if ((java.lang.Long.bitCount(h) & 1) != 0) 1.0 else -1.0
    }
    assert(p1(0).sameElements(firstPlane))
    // ±1 entries, balanced within binomial noise across the matrix
    assert(p1.flatten.forall(x => x == 1.0 || x == -1.0))
    val plus = p1.flatten.count(_ == 1.0)
    assert(math.abs(plus - 8192) < 500, s"biased plane matrix: $plus/+16384")
  }

  // ---- winnowing fingerprints ----

  private def winnowRef(s: String, k: Int, w: Int): Seq[Long] = {
    // independent reimplementation of the MOSS scheme (no shared code)
    val grams = s.length - k + 1
    if (grams <= 0) return Seq.empty
    val hs = (0 until grams).map(i =>
      s.substring(i, i + k).foldLeft(0L)((h, c) =>
        (h * 131L + c.toLong) % 1000000007L))
    (0 until math.max(grams - w + 1, 1))
      .map(i => hs.slice(i, math.min(i + w, grams)).min).distinct
  }

  private def winnowKernel(s: String, k: Int = 7, w: Int = 4): Seq[Long] = {
    val out = Vec.winnowFingerprints(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), k, w)
    (0 until out.numElements()).map(out.getLong(_))
  }

  test("winnowFingerprints matches an independent reimplementation") {
    val rnd = new scala.util.Random(11)
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    for (_ <- 1 to 200) {
      val s = Seq.fill(rnd.nextInt(60))(alpha(rnd.nextInt(alpha.length)))
        .mkString
      for ((k, w) <- Seq((7, 4), (5, 3), (3, 1), (1, 2)))
        assert(winnowKernel(s, k, w) == winnowRef(s, k, w),
          s"k=$k w=$w s=$s")
    }
  }

  test("winnowing guarantee: a shared k+w-1-char span shares a fp") {
    val rnd = new scala.util.Random(13)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val span = Seq.fill(10)(alpha(rnd.nextInt(26))).mkString // k+w-1 = 10
    for (_ <- 1 to 50) {
      def pad = Seq.fill(20 + rnd.nextInt(30))(alpha(rnd.nextInt(26)))
        .mkString
      val a = pad + span + pad
      val b = pad + span + pad
      assert(winnowKernel(a).toSet.intersect(winnowKernel(b).toSet).nonEmpty,
        s"span=$span not shared")
    }
  }

  test("winnowFingerprints edge cases: empty, shorter than one gram") {
    assert(winnowKernel("") == Seq.empty)
    assert(winnowKernel("abc") == Seq.empty) // < k chars
    assert(winnowKernel("abcdefg").size == 1) // exactly one gram
  }

  // ---- distq: the integer-domain distortion statistic ----
  //
  // PIN (round-13, VERDICT r12 #1): no double feeds a floor in any
  // hash-gated statistic. distq's only double op is xq = floor(x·2³²+½)
  // — ·2³² is a pure exponent shift (exact, so even FMA contraction
  // cannot change it) and +½ is ONE IEEE round-to-nearest add,
  // identical in every engine; everything downstream is BIGINT. The
  // BigInt reference below re-derives the statistic with arbitrary-
  // precision integers from the same xq, so any silent int64 overflow
  // or rounding-division drift in the kernel fails loudly here.

  private def distqRef(x: Seq[Double], sq: Seq[Long], c: Long): BigInt = {
    val dn = BigInt(c) * 65536
    x.zip(sq).map { case (xi, si) =>
      val xq = BigInt(math.floor(xi * 4294967296.0 + 0.5).toLong)
      val n = (BigInt(c) * xq - si).abs
      val q = (2 * n + dn) / (2 * dn) // floor div, nonneg operands
      q * q
    }.sum
  }

  test("distq matches a BigInt-rational reference across random " +
      "subvectors, counts, and sum magnitudes") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 500) {
      val dsub = 1 + rnd.nextInt(16)
      val c = 1L + rnd.nextInt(100000)
      val x = Seq.fill(dsub)(rnd.nextDouble() * 2 - 1)
      // sums consistent with a plausible centroid in [-1, 1]
      val sq = Seq.fill(dsub)((rnd.nextDouble() * 2 - 1) *
        c * 4294967296.0).map(_.toLong)
      val got = Vec.distq(new GenericArrayData(x.toArray),
        new GenericArrayData(sq.toArray), c)
      val want = distqRef(x, sq, c)
      assert(BigInt(got) == want, s"trial $trial: $got vs $want")
    }
  }

  test("distq magnitude agrees with floor(2^32·d2) within grid error " +
      "and rejects overflow-risk counts loudly") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 100) {
      val dsub = 8
      val c = 1L + rnd.nextInt(1000)
      val cent = Seq.fill(dsub)(rnd.nextDouble() * 2 - 1)
      val x = cent.map(_ + rnd.nextGaussian() * 0.1)
      val sq = cent.map(v => math.round(v * c * 4294967296.0))
      val got = Vec.distq(new GenericArrayData(x.toArray),
        new GenericArrayData(sq.toArray), c).toDouble
      val d2 = x.zip(cent).map { case (a, b) => (a - b) * (a - b) }.sum
      // each |residual| quantizes to the 2⁻¹⁶ grid: per-term error ≤
      // (r+g)²−r² ≤ 2rg+g², summed — loose bound 2·√d2·√dsub·g + dsub·g²
      val g = 1.0 / 65536
      val tol = (2 * math.sqrt(d2 * dsub) * g + dsub * g * g +
        1e-9) * 4294967296.0
      assert(math.abs(got - d2 * 4294967296.0) <= tol,
        s"got $got, want ~${d2 * 4294967296.0} ± $tol")
    }
    val a = new GenericArrayData(Array(0.5))
    val s = new GenericArrayData(Array(1L))
    intercept[IllegalArgumentException](Vec.distq(a, s, 0L))
    intercept[IllegalArgumentException](Vec.distq(a, s, 1L << 28))
    // exact documented bound: 2^28 - 2^9 is the first rejected count
    // (above it, 2a + dn can exceed 2^63 at the |x| = 2 residual
    // extreme and would have wrapped silently before the exact-ops fix)
    intercept[IllegalArgumentException](
      Vec.distq(a, s, (1L << 28) - (1L << 9)))
    assert(Vec.distq(a, s, (1L << 28) - (1L << 9) - 1L) >= 0L)
    // inputs outside the modeled envelope raise (exact ops), never wrap:
    // a huge |x| makes c*xq overflow int64 at the largest legal c
    val huge = new GenericArrayData(Array(1e18))
    intercept[ArithmeticException](
      Vec.distq(huge, s, (1L << 28) - (1L << 9) - 1L))
  }
}
