package graft

import graft.functions.Lm
import graft.operators.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Char-trigram LM kernels: code extraction, integer score arithmetic
  * against a sequential reference, and the filter property the operator
  * exists for (natural text ≫ gibberish under a corpus-trained model). */
class LmSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Sequential reference of the whole pipeline: codes, counts, score. */
  private def refCodes(s: String): Seq[Int] = {
    def c(ch: Char): Int =
      if (ch >= 'a' && ch <= 'z') ch - 'a'
      else if (ch >= '0' && ch <= '9') ch - '0' + 26
      else 36
    if (s.length < 3) Seq.empty
    else (0 to s.length - 3).map(i =>
      (c(s(i)) * 37 + c(s(i + 1))) * 37 + c(s(i + 2)))
  }

  private def refModel(corpus: Seq[String]): Array[Long] = {
    val m = new Array[Long](Lm.TriSpace)
    corpus.flatMap(refCodes).foreach(code => m(code) += 1)
    m
  }

  private def refScore(s: String, m: Array[Long]): Option[Long] = {
    val codes = refCodes(s)
    if (codes.isEmpty) None
    else {
      val ctx = Lm.ctxOf(m)
      Some(codes.map(t =>
        (m(t) + 1L) * 10000L / (ctx(t / 37) + 37L)).sum / codes.length)
    }
  }

  private val norm = (s: String) =>
    s.toLowerCase.replaceAll("[^a-z0-9]", " ").replaceAll(" +", " ").trim

  test("kernel codes and scores match the sequential reference on " +
      "random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val alphabet = "abcdefghij 0123"
    val corpus = (0 until 60).map(i =>
      s"doc $i " + Seq.fill(20 + rnd.nextInt(60))(
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    val normed = corpus.map(norm)
    val model = refModel(normed)

    val viaKernel = normed.zipWithIndex.map(_.swap).toDF("doc_id", "s")
      .select(col("doc_id"), Lm.lm_tri_codes(col("s")).as("codes"),
        Lm.lm_score_bp(col("s"), model).as("bp"))
      .collect().map(r => r.getInt(0) -> (r.getSeq[Int](1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap

    normed.zipWithIndex.foreach { case (s, i) =>
      assert(viaKernel(i)._1 == refCodes(s), s"codes diverge on doc $i")
      assert(viaKernel(i)._2 == refScore(s, model), s"score diverges on $i")
    }
  }

  test("distributed training equals the sequential histogram; spark " +
      "normalization equals the reference's") {
    import spark.implicits._
    val texts = Seq(
      "The quick brown fox; JUMPS over 42 lazy dogs!",
      "  múltiple   spaces\tand\nnon-ascii: 你好 ",
      "x", "", "ab")
    val viaSpark = texts.zipWithIndex.map(_.swap).toDF("doc_id", "text")
    // normalization parity
    val sparkNorm = viaSpark.select(TextOps.lmNorm(col("text")).as("s"))
      .collect().map(_.getString(0))
    assert(sparkNorm.toSeq == texts.map(norm))
    // trained model parity (short docs contribute nothing, not errors)
    val m = TextOps.trainCharLm(viaSpark)
    assert(m.toSeq == refModel(texts.map(norm)).toSeq)
  }

  test("the filter property: natural text outscores gibberish and " +
      "wrong-alphabet text under the corpus model") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val natural = (0 until 200).map(i =>
      "the quick brown fox jumps over the lazy dog and the small cat " +
        s"sleeps near the warm fire in chapter $i of the long story")
    val junk = (0 until 5).map(_ =>
      Seq.fill(120)("abcdefghijklmnopqrstuvwxyz0123456789"(
        rnd.nextInt(36))).mkString(""))
    val digits = Seq("9463850272635182740918273645546372819045638291046" * 3)
    val corpus = natural ++ junk ++ digits
    val df = corpus.zipWithIndex.map(_.swap).toDF("doc_id", "text")
    val model = TextOps.trainCharLm(df)
    val scores = df.select(col("doc_id"),
        Lm.lm_score_bp(TextOps.lmNorm(col("text")), model).as("bp"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val naturalMin = (0 until natural.size).map(scores).min
    val junkMax = (natural.size until corpus.size).map(scores).max
    assert(naturalMin > junkMax * 2,
      s"LM filter failed to separate: naturalMin=$naturalMin junkMax=$junkMax")
  }

  test("short and null docs score null, never throw") {
    import spark.implicits._
    val m = new Array[Long](Lm.TriSpace)
    val df = Seq((1L, "ab"), (2L, null.asInstanceOf[String]), (3L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        Lm.lm_score_bp(TextOps.lmNorm(col("text")), m).as("bp"))
    assert(df.collect().forall(_.isNullAt(1)))
  }
}
