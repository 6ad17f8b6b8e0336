package graft

import graft.functions.Vec
import graft.operators.DedupOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Gate for the portable hash family behind the MinHash/SimHash/LSH dedup
  * queries (round 9: xxhash64 → portable pair-folds so the DuckDB oracle
  * can recompute signatures step-for-step).
  *
  * Three layers, mirroring the winnow-kernel migration (round 5):
  *  1. cross-language pins — literal values computed by an INDEPENDENT
  *     implementation of the spec'd math (a Python reference, which also
  *     validated the DuckDB SQL mirror before the Scala kernels were
  *     written), so the kernel and its oracle can't drift together;
  *  2. a randomized kernel sweep — random corpora through the codegen'd
  *     expressions vs a plain-Scala re-derivation on the driver;
  *  3. a randomized end-to-end sweep — the batch LSH pair query vs a
  *     brute-force all-pairs Jaccard oracle on corpora with injected
  *     near-dups (recall AND precision of the banded path, at several
  *     perturbation strengths).
  */
class PortableHashSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // ---- plain-Scala reference re-derivation (independent of Vec) ----

  private val P1 = 1000000007L
  private val P2 = 998244353L

  private def refHash(s: String): Long = {
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h1 = (h1 * 131 + cp) % P1
      h2 = (h2 * 137 + cp) % P2
      i += Character.charCount(cp)
    }
    (h1 << 30) | h2
  }

  private def refFold(hs: Seq[Long]): Long = {
    var g1 = 0L; var g2 = 0L
    hs.foreach { h => g1 = (g1 * 131 + h) % P1; g2 = (g2 * 137 + h) % P2 }
    (g1 << 30) | g2
  }

  private def refShingles(toks: Seq[String], n: Int): Seq[Long] =
    toks.sliding(n).filter(_.length == n)
      .map(w => refFold(w.map(refHash))).toSeq.distinct

  private def refMinhash(sh: Seq[Long], k: Int): Seq[Long] =
    (0 until k).map { j =>
      val a = (j * 2654435761L) % (P1 - 1) + 1
      val b = (j * 2246822519L) % P1
      if (sh.isEmpty) Long.MaxValue
      else sh.map(h => (a * (h % P1) + b) % P1).min
    }

  private def refSimhash(toks: Seq[String]): Long = {
    val votes = new Array[Int](60)
    toks.foreach { t =>
      val h = refHash(t)
      (0 until 60).foreach(b =>
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1)
    }
    (0 until 60).foldLeft(0L)((acc, b) =>
      if (votes(b) > 0) acc | (1L << b) else acc)
  }

  private def refGrams(text: String, n: Int): Seq[Long] = {
    val grams = math.max(text.length - n + 1, 1)
    (0 until grams).map(i =>
      refHash(text.substring(i, math.min(i + n, text.length)))).distinct
  }

  // ---- layer 1: cross-language pins (Python-computed literals) ----

  test("portable hash matches the independent cross-language pins") {
    import spark.implicits._
    val got = Seq(("ab", "the", "", "café"))
      .toDF("a", "b", "c", "d")
      .select(Vec.token_hashes(array(col("a"), col("b"), col("c"), col("d"))))
      .head.getSeq[Long](0)
    assert(got == Seq(13749264069707L, 2152209187958977L, 0L,
      240775030425277851L))
    assert(refFold(Seq(13749264069707L, 2152209187958977L)) ==
      808975408606198808L)
    import org.apache.spark.sql.Row
    val mh = Seq(Tuple1(Seq("alpha", "beta", "gamma")))
      .toDF("t")
      .select(Vec.minhash_sig(Vec.token_hashes(col("t")), 4))
      .head.getSeq[Long](0)
    assert(mh == Seq(121098027L, 158080788L, 316161576L, 289775859L))
    val sh = Seq(Tuple1(Seq("a", "b", "a"))).toDF("t")
      .select(Vec.simhash64(Vec.token_hashes(col("t"))))
      .head.getLong(0)
    assert(sh == 104152957025L)
  }

  /** DuckDB-semantics re-derivation: `s[j]`/`ascii` walk GRAPHEME
    * CLUSTERS and take the first code point of each — this models what
    * the pHashSql oracle fragment would compute, without needing DuckDB
    * in-process. */
  private def graphemeRefHash(s: String): Long = {
    val it = java.text.BreakIterator.getCharacterInstance(
      java.util.Locale.ROOT)
    it.setText(s)
    var h1 = 0L; var h2 = 0L
    var start = it.first(); var end = it.next()
    while (end != java.text.BreakIterator.DONE) {
      val cp = s.codePointAt(start)
      h1 = (h1 * 131 + cp) % P1
      h2 = (h2 * 137 + cp) % P2
      start = end; end = it.next()
    }
    (h1 << 30) | h2
  }

  test("character-unit boundary: where code-point and grapheme walks " +
      "agree and where they must diverge") {
    import spark.implicits._
    // The engine hashes code points; the DuckDB oracle hashes grapheme
    // clusters (first code point of each). The oracle gate is only sound
    // where the two walks coincide: every grapheme = one BMP code point.
    // This pin makes that boundary executable: if a corpus drop ever
    // carries combining marks, the dedup hash gates are expected to
    // diverge — fail HERE, with a name, not as an opaque mismatch.
    val ascii = "plain ascii text"
    val bmp = "café über règle"              // BMP, no combining marks
    val combining = "café"             // e + COMBINING ACUTE ACCENT
    val astral = "math 𝕏 symbol"  // U+1D54F (astral plane)
    def kernel(s: String): Long =
      Seq(Tuple1(Seq(s))).toDF("t")
        .select(Vec.token_hashes(col("t"))).head.getSeq[Long](0).head
    // kernel contract: always the code-point walk, for every plane
    for (s <- Seq(ascii, bmp, combining, astral))
      assert(kernel(s) == refHash(s), s"kernel vs code-point walk: '$s'")
    // agreement region (oracle sound): ASCII, BMP-without-combining,
    // and even astral code points (one grapheme = one code point there)
    for (s <- Seq(ascii, bmp, astral))
      assert(graphemeRefHash(s) == refHash(s), s"walks must agree: '$s'")
    // divergence region (oracle unsound — corpus generator must keep
    // combining sequences out, or the SQL mirror needs a code-point walk)
    assert(graphemeRefHash(combining) != refHash(combining),
      "combining-mark text is expected to diverge between the walks; " +
        "if this ever fails, re-audit pHashSql's character unit")
  }

  // ---- layer 2: randomized kernel sweep ----

  test("randomized sweep: kernels equal the plain-Scala re-derivation") {
    import spark.implicits._
    val rnd = new scala.util.Random(97)
    val vocab = Vector("a", "bb", "ccc", "key", "agg", "röw", "scan", "x9",
      "", "the-quick", "zz zz")
    (0 until 20).foreach { trial =>
      val docs = (0 until 30).map { id =>
        val n = 1 + rnd.nextInt(24)
        (id.toLong, Vector.fill(n)(vocab(rnd.nextInt(vocab.size))))
      }
      val df = docs.toDF("doc_id", "toks")
        .withColumn("text", concat_ws("|", col("toks")))
      val got = df.select(col("doc_id"),
          Vec.token_hashes(col("toks")).as("th"),
          Vec.shingle_hashes(col("toks"), 3).as("sh"),
          Vec.minhash_sig(Vec.shingle_hashes(col("toks"), 3), 8).as("mh"),
          Vec.simhash64(Vec.token_hashes(col("toks"))).as("sim"),
          Vec.char_gram_hashes(col("text"), 3).as("gr"))
        .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
      docs.foreach { case (id, toks) =>
        val r = got(id)
        assert(r.getSeq[Long](1) == toks.map(refHash), s"trial $trial th")
        assert(r.getSeq[Long](2) == refShingles(toks, 3), s"trial $trial sh")
        assert(r.getSeq[Long](3) == refMinhash(refShingles(toks, 3), 8),
          s"trial $trial mh")
        assert(r.getLong(4) == refSimhash(toks), s"trial $trial sim")
        assert(r.getSeq[Long](5) == refGrams(toks.mkString("|"), 3),
          s"trial $trial gr")
      }
    }
  }

  // ---- layer 3: randomized end-to-end LSH vs brute force ----

  private def bruteJaccardPairs(docs: Seq[(Long, String)],
      threshold: Double): Set[(Long, Long)] = {
    val sh = docs.map { case (id, text) =>
      id -> refShingles(text.toLowerCase.split("\\s+").toSeq, 5).toSet
    }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      u = (sa | sb).size if u > 0
      if (sa & sb).size.toDouble / u >= threshold
    } yield (a, b)).toSet
  }

  test("randomized sweep: banded pairs vs brute-force Jaccard oracle") {
    import spark.implicits._
    val rnd = new scala.util.Random(131)
    val vocab = Vector.tabulate(40)(i => s"w$i")
    (0 until 6).foreach { trial =>
      val base = (0 until 25).map { id =>
        val n = 8 + rnd.nextInt(40)
        (id.toLong, Vector.fill(n)(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }
      // perturb every 1-in-k tokens, k varying per trial (strong → weak)
      val k = 5 + 6 * trial
      val dups = base.take(10).map { case (id, text) =>
        (id + 1000, text.split(" ").zipWithIndex
          .map { case (t, i) => if (i % k == 0) "zdupz" else t }
          .mkString(" "))
      }
      val corpus = base ++ dups
      val got = DedupOps
        .minhashNearDupPairs(corpus.toDF("doc_id", "text"), 0.4)
        .collect().map(r =>
          (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
      val want = bruteJaccardPairs(corpus, 0.4)
      // banded candidates are a subset of all pairs: zero false positives
      assert(got.subsetOf(want), s"trial $trial false positives: " +
        s"${got -- want}")
      // the 8x2 band recall at j>=0.4 is ~0.94 worst-case per pair; over
      // the injected pairs require no more than a small tail missed
      val missed = want -- got
      assert(missed.size <= math.max(1, want.size / 5),
        s"trial $trial missed ${missed.size}/${want.size}: $missed")
    }
  }
}
