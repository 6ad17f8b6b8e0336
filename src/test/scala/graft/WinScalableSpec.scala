package graft

import graft.operators.ExtendedOps
import org.apache.spark.sql.Row
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The scalable win_extras twin must be RESULT-IDENTICAL to the
  * global-window form — including NTile's ceil-division tiling and the
  * lead() patch across bucket boundaries — for any bucket size, on keyspaces
  * with gaps (orders keys are sparse, so buckets can be empty). */
class WinScalableSpec extends AnyFunSuite with BeforeAndAfterAll with TempDirCleanup {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }


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

  test("randomized sweep: all three scalable twins equal their global " +
      "forms on adversarial keyspaces and bucket sizes") {
    // Seeded: failures reproduce. Keyspaces are distinct (o_orderkey is a
    // PK — with duplicates, global-order tie-breaks are nondeterministic
    // and BOTH forms would be unstable), but otherwise adversarial: dense
    // runs, huge gaps, singleton tables, counts not divisible by 4.
    import graft.operators.{ExtendedOps, RelationalOps}
    import spark.implicits._
    val rnd = new scala.util.Random(0x5ca1ab1e)
    val statuses = Array("O", "F", "P")
    for (trial <- 1 to 5) {
      val nKeys = 1 + rnd.nextInt(300)
      val span = 1 + rnd.nextInt(5000)
      val keys = rnd.shuffle((0 until span).toList).take(nKeys)
        .map(_.toLong + rnd.nextInt(3) * 100000L) // occasional far outliers
        .distinct
      val df = keys.map(k => (k, statuses(rnd.nextInt(statuses.length))))
        .toDF("o_orderkey", "o_orderstatus")
      val tmp = tempDir(s"winsweep$trial")
      df.write.mode("overwrite").parquet(s"$tmp/orders.parquet")
      val bucketSize = Seq(1L, 7L, 64L, 1L << 30)(rnd.nextInt(4))
      assert(
        rows(ExtendedOps.winExtrasScalableFn(spark, tmp, bucketSize)) ==
          rows(ExtendedOps.winExtras.fn(spark, tmp)),
        s"win_extras trial $trial bucketSize $bucketSize n=${keys.size}")
      assert(
        rows(RelationalOps.win1GapCheckScalable.fn(spark, tmp)) ==
          rows(RelationalOps.win1GapCheck.fn(spark, tmp)),
        s"gap check trial $trial n=${keys.size}")
      assert(
        rows(RelationalOps.win2RowNumberScalable.fn(spark, tmp)) ==
          rows(RelationalOps.win2RowNumber.fn(spark, tmp)),
        s"row-number trial $trial n=${keys.size}")
    }
  }

  test("spanBucketSize keeps the bucket count bounded at any key span") {
    import graft.operators.ExtendedOps.spanBucketSize
    import spark.implicits._
    val small = Seq(1L, 5L, 9L).toDF("k")
    assert(spanBucketSize(small, "k") == 1L) // tiny span: one key per bucket
    val wide = Seq(0L, 1L << 50).toDF("k")
    val bs = spanBucketSize(wide, "k")
    // the derived size caps the bucket count near the target regardless
    // of span — the metadata frame stays driver-bounded at any scale
    assert(((1L << 50) / bs) <= 4097L, s"bucket count unbounded: size $bs")
    val empty = Seq.empty[Long].toDF("k")
    assert(spanBucketSize(empty, "k") == 1L)
    // mixed-sign extremes must not wrap the span negative and collapse to
    // size 1 (one bucket PER KEY — the unbounded case the helper exists
    // to prevent); saturation gives few, wide buckets instead
    val extremes = Seq(Long.MinValue, -1L, 0L, Long.MaxValue).toDF("k")
    val ebs = spanBucketSize(extremes, "k")
    assert(ebs >= Long.MaxValue / 4096L, s"span wrapped: size $ebs")
    // int32 key columns (the corpus ships both widths) must not throw
    val int32 = Seq(1, 100, 5000).toDF("k")
    assert(spanBucketSize(int32, "k") >= 1L)
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
    val tmp = tempDir("winscale")
    df.write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val got = ExtendedOps.winExtrasScalableFn(spark, tmp, 8L)
      .select("o_orderkey", "quartile")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expected)
  }
}
