package graft

import graft.operators.LayoutOps
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Z-order layout: the interleave must match an independent bit-by-bit
  * reimplementation, and a z-sorted parquet file must physically admit
  * fewer candidate row groups for a two-dimensional box predicate than a
  * single-dimension sort — read straight from the parquet footers, the
  * same min/max stats any engine's scan pruning consults. */
class ZOrderSpec extends AnyFunSuite with BeforeAndAfterAll
    with TempDirCleanup {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  /** Reference Morton code: per-bit loop, independent of the closed-form
    * shift/mask chain under test. 31 bits per dimension (the zValue
    * contract — bit 62 is the top interleave bit, the sign bit is never
    * touched in any engine). */
  private def mortonRef(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("closed-form z-value equals the per-bit reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (2147483647L, 2147483647L)) ++
      Seq.fill(200)((rnd.nextInt(Int.MaxValue).toLong,
        rnd.nextInt(Int.MaxValue).toLong))
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"),
        LayoutOps.zValue(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (a, b) =>
      assert(got((a, b)) == mortonRef(a, b), s"($a, $b)")
    }
  }

  test("z-order preserves box locality: aligned z-ranges are boxes") {
    // on a dense 2^k x 2^k grid the z codes are exactly 0..4^k-1, and
    // every ALIGNED run of 4^j consecutive codes is one 2^j x 2^j quad —
    // the property that keeps row-group min/max stats tight in BOTH dims
    // (unaligned runs may cross quadrant midlines; alignment matters)
    import spark.implicits._
    val grid = for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)
    val sortedZ = grid.toDF("a", "b")
      .select(col("a"), col("b"), LayoutOps.zValue(col("a"), col("b")).as("z"))
      .orderBy("z").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sortedZ.length == 4096)
    sortedZ.grouped(16).foreach { quad =>
      val (as, bs) = (quad.map(_._1), quad.map(_._2))
      assert(as.max - as.min == 3 && bs.max - bs.min == 3,
        s"aligned 16-run is not a 4x4 quad: ${quad.take(4).toSeq}...")
    }
  }

  /** Row groups whose (a, b) min/max stats overlap the box — what a
    * scan's row-group pruning admits. */
  private def candidateRowGroups(dir: String, aLo: Long, aHi: Long,
      bLo: Long, bHi: Long): (Int, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    var overlapping = 0
    var total = 0
    files.foreach { f =>
      val reader = ParquetFileReader
        .open(HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
      try {
        reader.getFooter.getBlocks.asScala.foreach { bg =>
          total += 1
          val stats = bg.getColumns.asScala
            .map(c => c.getPath.toDotString -> c.getStatistics).toMap
          def overlap(colName: String, lo: Long, hi: Long): Boolean = {
            val s = stats(colName)
            val mn = s.genericGetMin.asInstanceOf[Number].longValue
            val mx = s.genericGetMax.asInstanceOf[Number].longValue
            mx >= lo && mn <= hi
          }
          if (overlap("a", aLo, aHi) && overlap("b", bLo, bHi))
            overlapping += 1
        }
      } finally reader.close()
    }
    (overlapping, total)
  }

  test("z-sorted parquet admits fewer row groups for a 2-dim box predicate") {
    import spark.implicits._
    val n = 1 << 18 // 256k points on a 512x512 grid
    val base = spark.range(n).select(
      (col("id") % 512).as("a"),
      // decorrelate b from a with a deterministic odd-multiplier hash
      ((col("id") * 2654435761L) % 512).as("b"))
    val tmp = tempPath("graft-zorder")
    val oneDim = s"$tmp/bya"
    val zDim = s"$tmp/byz"
    // small row groups so both files get many of them
    val opts = Map("parquet.block.size" -> (64 * 1024).toString)
    base.orderBy("a").coalesce(1).write.options(opts).parquet(oneDim)
    base.select(col("a"), col("b"),
        LayoutOps.zValue(col("a"), col("b")).as("z"))
      .orderBy("z").coalesce(1).drop("z")
      .write.options(opts).parquet(zDim)
    // box selective in BOTH dims: the a-sort prunes on a only; the
    // z-sort's row groups are tight in a AND b
    val (aHit, aTotal) = candidateRowGroups(oneDim, 100, 131, 100, 131)
    val (zHit, zTotal) = candidateRowGroups(zDim, 100, 131, 100, 131)
    assert(aTotal >= 8 && zTotal >= 8, s"want many row groups: $aTotal, $zTotal")
    // the z layout must admit a strictly smaller candidate fraction
    val aFrac = aHit.toDouble / aTotal
    val zFrac = zHit.toDouble / zTotal
    assert(zFrac < aFrac,
      s"z-order should prune harder: z $zHit/$zTotal vs a-sort $aHit/$aTotal")
  }
}
