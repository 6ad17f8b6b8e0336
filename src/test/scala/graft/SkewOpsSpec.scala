package graft

import graft.operators.SkewOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Salted skew utilities must agree exactly with their unsalted forms on
  * a synthetic hot-key distribution (90% of rows share one key). */
class SkewOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def skewed = {
    import spark.implicits._
    (0 until 20000).map { i =>
      val key = if (i % 10 == 0) (i % 7).toLong else 0L // hot key 0
      (key, i.toLong, i.toDouble)
    }.toDF("k", "id", "v")
  }

  test("salted sum equals plain groupBy sum on a hot-key distribution") {
    val df = skewed
    val plain = df.groupBy(col("k")).agg(sum(col("v")).as("total"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val salted = SkewOps.saltedSum(df, col("k"), col("v"), col("id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(salted == plain)
  }

  test("salted join equals plain join on a hot-key distribution") {
    import spark.implicits._
    val big = skewed
    val small = (0L to 6L).map(k => (k, s"dim-$k")).toDF("dk", "label")
    val plain = big.join(small, col("k") === col("dk"))
      .select(col("id"), col("label"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = SkewOps.saltedJoin(big, small, col("k"), col("dk"),
        col("id"))
      .select(col("id"), col("label"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
    assert(salted.nonEmpty)
  }
}
