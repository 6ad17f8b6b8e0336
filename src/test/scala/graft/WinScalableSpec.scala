package graft

import graft.operators.ExtendedOps
import org.apache.spark.sql.Row
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The scalable win_extras twin must be RESULT-IDENTICAL to the
  * global-window form — including NTile's ceil-division tiling and the
  * lead() patch across bucket boundaries — for any bucket size, on keyspaces
  * with gaps (orders keys are sparse, so buckets can be empty). */
class WinScalableSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Row] = {
    val cols = df.columns.sorted.map(org.apache.spark.sql.functions.col)
    df.select(cols.toSeq: _*).collect().toSet
  }

  private lazy val global: Set[Row] =
    rows(ExtendedOps.winExtras.fn(spark, dir))

  test("scalable twin equals the global-window form (default buckets)") {
    assert(rows(ExtendedOps.winExtrasScalable.fn(spark, dir)) == global)
  }

  test("equality holds with tiny buckets (forces empty buckets + patches)") {
    // bucketSize 16 over sparse o_orderkey leaves many empty buckets; every
    // bucket boundary exercises the lead() successor patch.
    assert(rows(ExtendedOps.winExtrasScalableFn(spark, dir, 16L)) == global)
  }

  test("equality holds when everything lands in one bucket") {
    assert(rows(ExtendedOps.winExtrasScalableFn(spark, dir, 1L << 40)) == global)
  }

  test("ntile arithmetic matches Spark's NTile when n % 4 != 0") {
    // 10 rows -> tiles of 3,3,2,2: positions 1-3 ->1, 4-6 ->2, 7-8 ->3, 9-10 ->4
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val keys = Seq(1L, 2L, 5L, 7L, 11L, 13L, 17L, 23L, 29L, 31L)
    val df = keys.map(k => (k, "O")).toDF("o_orderkey", "o_orderstatus")
    val expected = df.select(col("o_orderkey"),
      ntile(4).over(Window.orderBy(col("o_orderkey"))).as("quartile"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // run the scalable decomposition over the same tiny frame via a temp dir
    val tmp = java.nio.file.Files.createTempDirectory("winscale").toString
    df.write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val got = ExtendedOps.winExtrasScalableFn(spark, tmp, 8L)
      .select("o_orderkey", "quartile")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expected)
  }
}
