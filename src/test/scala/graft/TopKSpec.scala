package graft

import graft.functions.TopK
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries top-k aggregate: the classic guarantee against exact
  * counts (presence of every term above N/(capacity+1), undercount
  * bounded by N/(capacity+1)), exercised on a repartitioned DataFrame so
  * the partial/merge/serialize paths all actually run — plus exactness
  * when the summary never overflows, and the SQL-registered form. */
class TopKSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Zipf-ish skewed token stream with a hapax tail, shuffled so heavy
    * terms interleave with noise in every partition. */
  private def corpus: Seq[String] = {
    val rnd = new scala.util.Random(7)
    val heavy = (1 to 20).flatMap(i => Seq.fill(2400 / i)(f"term$i%02d"))
    val tail = (0 until 4000).map(i => s"hapax$i")
    rnd.shuffle(heavy ++ tail)
  }

  private def summarize(k: Int, capacity: Int,
      partitions: Int): Map[String, Long] = {
    import spark.implicits._
    corpus.toDF("token").repartition(partitions)
      .agg(TopK.mg_top_k(col("token"), k, capacity).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.term"), col("e.cnt_est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("presence and undercount guarantees hold across forced " +
      "partial/merge/serde paths") {
    val exact = corpus.groupBy(identity).map { case (t, xs) =>
      t -> xs.size.toLong
    }
    val n = corpus.size.toLong
    val capacity = 50
    val bound = n / (capacity + 1)
    // k = capacity: report the full summary so every entry is checkable
    val est = summarize(capacity, capacity, partitions = 8)
    // every term with true frequency > N/(capacity+1) must be PRESENT
    exact.filter(_._2 > bound).keys.foreach(t =>
      assert(est.contains(t), s"heavy term $t missing from MG summary"))
    // every reported estimate undercounts by at most the bound
    est.foreach { case (t, c) =>
      val ex = exact.getOrElse(t, 0L)
      assert(c <= ex, s"$t overcounted: est=$c exact=$ex")
      assert(c >= ex - bound, s"$t undercounted past bound: est=$c exact=$ex")
    }
  }

  test("a summary that never overflows is exact, whatever the " +
      "partitioning") {
    import spark.implicits._
    val tokens = (0 until 500).map(i => s"t${i % 7}")
    val exact = tokens.groupBy(identity).map { case (t, xs) =>
      t -> xs.size.toLong
    }
    val est = tokens.toDF("token").repartition(8)
      .agg(TopK.mg_top_k(col("token"), 7, 64).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.term"), col("e.cnt_est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == exact)
  }

  test("nulls are ignored; empty input yields an empty array") {
    import spark.implicits._
    val est = Seq(Some("a"), None, Some("a"), Some("b"))
      .toDF("token").repartition(3)
      .agg(TopK.mg_top_k(col("token"), 2, 8).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.term"), col("e.cnt_est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("a" -> 2L, "b" -> 1L))
    val empty = spark.emptyDataFrame.sparkSession
      .range(0).selectExpr("cast(null as string) as token")
      .filter(col("token").isNotNull)
      .agg(TopK.mg_top_k(col("token"), 2, 8).as("top"))
      .collect()
    assert(empty.head.getSeq[Any](0).isEmpty)
  }

  test("composes with groupBy: per-group summaries stay independent") {
    import spark.implicits._
    val rows = (0 until 300).map(i => ("en", s"e${i % 5}")) ++
      (0 until 200).map(i => ("fr", s"f${i % 3}"))
    val perLang = rows.toDF("lang", "token").repartition(6)
      .groupBy("lang")
      .agg(TopK.mg_top_k(col("token"), 2, 16).as("top"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0)).toSet).toMap
    // no overflow in either group -> exact; top-2 ties break by term asc
    assert(perLang("en") == Set("e0", "e1"))
    assert(perLang("fr") == Set("f0", "f1"))
  }

  test("the SQL-registered graft_mg_top_k matches the Column API " +
      "guarantee and rejects non-literal parameters") {
    import spark.implicits._
    corpus.toDF("token").repartition(8).createOrReplaceTempView("toks")
    val exact = corpus.groupBy(identity).map { case (t, xs) =>
      t -> xs.size.toLong
    }
    val bound = corpus.size.toLong / 51
    val est = spark.sql(
      """SELECT e.term, e.cnt_est
        |FROM (SELECT graft_mg_top_k(token, 50, 50) AS top FROM toks)
        |LATERAL VIEW explode(top) AS e""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.filter(_._2 > bound).keys.foreach(t =>
      assert(est.contains(t), s"heavy term $t missing via SQL form"))
    est.foreach { case (t, c) =>
      assert(c <= exact.getOrElse(t, 0L) && c >= exact.getOrElse(t, 0L) - bound)
    }
    val err = intercept[Exception](
      spark.sql("SELECT graft_mg_top_k(token, 50, length(token)) FROM toks")
        .collect())
    assert(err.getMessage.contains("graft_mg_top_k"))
  }
}
