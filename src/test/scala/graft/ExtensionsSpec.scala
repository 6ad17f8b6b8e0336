package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The SQL function surface injected by [[GraftExtensions]]: every custom
  * kernel callable from `spark.sql` text, agreeing exactly with its Column
  * API form, with literal-parameter validation at analysis time. */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("scalar kernels evaluate from SQL text") {
    val row = spark.sql(
      """SELECT
        |  graft_vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
        |  graft_vec_unit(array(3.0D, 4.0D))[0] AS ux,
        |  graft_u256_add('340282366920938463463374607431768211456', '1')
        |    AS u_add,
        |  graft_u256_cmp('10', '9') AS u_cmp,
        |  graft_hamming64(array(0L), array(7L)) AS ham,
        |  graft_zvalue(3L, 5L) AS z,
        |  graft_vec_l2sq(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS l2,
        |  graft_pq_adc(array(1, 0), array(10L, 20L, 30L, 40L), 2) AS adc,
        |  graft_vec_sub(array(1.0D, 2.0D), array(3.0D, 1.0D)) AS vsub
        |""".stripMargin).head()
    assert(row.getAs[Double]("dot") == 11.0)
    assert(math.abs(row.getAs[Double]("ux") - 0.6) < 1e-12)
    assert(row.getAs[String]("u_add") ==
      "340282366920938463463374607431768211457")
    assert(row.getAs[Int]("u_cmp") == 1)
    assert(row.getAs[Int]("ham") == 3)
    // interleave(a=11b, b=101b) = b1 a1 b0 a0 ... = 100111b = 39
    assert(row.getAs[Long]("z") == 39L)
    assert(row.getAs[Double]("l2") == 8.0) // (1-3)^2 + (2-4)^2
    // codes [1,0] over a 2x2 table: tbl[0*2+1] + tbl[1*2+0] = 20 + 30
    assert(row.getAs[Long]("adc") == 50L)
    assert(row.getSeq[Double](row.fieldIndex("vsub")) == Seq(-2.0, 1.0))
  }

  test("SQL kernels agree with the Column API on real text") {
    import spark.implicits._
    val d = Seq("the quick brown fox jumps over the lazy dog repeatedly")
      .toDF("text")
    d.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT graft_winnow_fps(regexp_replace(lower(text),
        |  '[^a-z0-9]', ''), 7, 4) AS fps,
        |  graft_simhash64(transform(split(lower(text), '\\s+'),
        |    t -> xxhash64(t))) AS sh,
        |  graft_shingle_hashes(split(lower(text), '\\s+'), 5) AS grams,
        |  graft_lm_tri_codes(lower(text)) AS tri
        |FROM ext_docs""".stripMargin).head()
    val viaCol = d.select(
      graft.functions.Vec.winnow_fps(
        regexp_replace(lower(col("text")), "[^a-z0-9]", ""), 7, 4).as("fps"),
      graft.functions.Vec.simhash64(
        expr("transform(split(lower(text), '\\\\s+'), t -> xxhash64(t))"))
        .as("sh"),
      graft.functions.Vec.shingle_hashes(
        split(lower(col("text")), "\\s+"), 5).as("grams"),
      graft.functions.Lm.lm_tri_codes(lower(col("text"))).as("tri")).head()
    assert(viaSql.getSeq[Long](0) == viaCol.getSeq[Long](0))
    assert(viaSql.getAs[Long]("sh") == viaCol.getAs[Long]("sh"))
    assert(viaSql.getSeq[Int](3) == viaCol.getSeq[Int](3))
    assert(viaSql.getSeq[Long](2) == viaCol.getSeq[Long](2))
  }

  test("aggregate and generator register like built-ins") {
    val agg = spark.sql(
      // two huge U256 values a decimal(38) sum would overflow
      """SELECT graft_u256_sum(v) AS s FROM VALUES
        |  ('99999999999999999999999999999999999999'),
        |  ('1') t(v)""".stripMargin).head()
    assert(agg.getAs[String]("s") == "100000000000000000000000000000000000000")
    // generator fans out rows inline (explode-shaped)
    val n = spark.sql(
      s"""SELECT tr.* FROM VALUES ('0xabc') t(sender)
         |LATERAL VIEW graft_cbc20_decode(sender,
         |  '${graft.chain.ChainFixture.transferCalldata(
              graft.chain.ChainFixture.addr(2), BigInt(5))}') tr"""
        .stripMargin).count()
    assert(n == 1)
  }

  test("kernel parameters must be integer literals") {
    import spark.implicits._
    val err = intercept[Exception] {
      Seq(("a b c d e f", 5)).toDF("text", "k").createOrReplaceTempView("tk")
      spark.sql(
        "SELECT graft_shingle_hashes(split(text, ' '), k) FROM tk").collect()
    }
    assert(err.getMessage.contains("integer literal"))
  }

  test("Long kernel parameters past Int range are rejected, not truncated") {
    import spark.implicits._
    Seq("a b c d e f").toDF("text").createOrReplaceTempView("tk2")
    // 4294967297 = 2^32 + 1 truncates to n=1 if accepted silently
    val err = intercept[Exception] {
      spark.sql(
        "SELECT graft_shingle_hashes(split(text, ' '), 4294967297) FROM tk2")
        .collect()
    }
    assert(err.getMessage.contains("32-bit"))
  }
}
