package graft

import graft.operators.{ImageDedupOps, PairedDedupOps}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Paired-sample (image + caption) dedup: the conjunctive policy's
  * discriminating branches, pinned by name — the driver oracle gates
  * the full pair/cluster sets, these tests gate WHY each planted case
  * lands where it does. */
class PairedDedupSpec extends AnyFunSuite with BeforeAndAfterAll
    with TempDirCleanup {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  private lazy val pairs = {
    import spark.implicits._
    PairedDedupOps.pairedNearDupPairs(
      PairedDedupOps.pairedAssets(ImageDedupOps.NumImages)
        .toDF("pair_id", "payload", "caption"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("verbatim-caption re-encode IS a sample dup; one-word-edit " +
      "resize IS a sample dup (Jaccard stays above the floor)") {
    for (i <- 0L until ImageDedupOps.DupSeeds.toLong) {
      assert(pairs.contains((i, i + 1000L)),
        s"seed $i: re-encode with verbatim caption must be a dup")
      assert(pairs.contains((i, i + 3000L)),
        s"seed $i: resized copy with one-word-edited caption must be " +
          "a dup")
    }
  }

  test("the discriminating case: an image dup under a DIFFERENT " +
      "caption is a DIFFERENT training sample — +2000 pairs with " +
      "nothing despite Hamming 0") {
    val withBrightness = pairs.filter { case (a, b) =>
      (a >= 2000L && a < 3000L) || (b >= 2000L && b < 3000L) }
    assert(withBrightness.isEmpty,
      s"+2000 variants carry disjoint captions and must not pair: " +
        s"$withBrightness")
  }

  test("identical caption on an UNRELATED image never pairs — the " +
      "image side gates candidate generation") {
    assert(!pairs.contains((20L, 21L)),
      "base 20/21 share a caption verbatim but their images are " +
        "independent renders — the conjunctive policy must not pair them")
  }

  test("clusters: each planted seed collapses to {i, i+1000, i+3000} " +
      "with the different-caption +2000 variant left out") {
    import spark.implicits._
    val comps = graft.operators.CurationOps.connectedComponents(
      PairedDedupOps.pairedNearDupPairs(
        PairedDedupOps.pairedAssets(ImageDedupOps.NumImages)
          .toDF("pair_id", "payload", "caption"))
        .select(org.apache.spark.sql.functions.col("id_a"),
          org.apache.spark.sql.functions.col("id_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    for (i <- 0L until ImageDedupOps.DupSeeds.toLong) {
      assert(comps.get(i + 1000L).contains(i) &&
        comps.get(i + 3000L).contains(i),
        s"seed $i: {i, i+1000, i+3000} must share component $i")
      assert(!comps.contains(i + 2000L),
        s"seed $i: the +2000 variant must stay OUT of the component")
    }
  }

  test("caption fixture sanity: one-word edit keeps gram Jaccard " +
      "above the floor, the disjoint template stays below it") {
    def grams(s: String): Set[String] =
      (0 to s.length - 3).map(i => s.substring(i, i + 3)).toSet
    def jac(a: String, b: String): Double = {
      val (ga, gb) = (grams(a), grams(b))
      ga.intersect(gb).size.toDouble / ga.union(gb).size
    }
    for (i <- 0L until ImageDedupOps.DupSeeds.toLong) {
      val j13 = jac(PairedDedupOps.captionFor(i),
        PairedDedupOps.captionFor(i + 3000L))
      assert(j13 >= PairedDedupOps.CaptionJaccard,
        s"seed $i: one-word edit fell below the floor ($j13)")
      val j12 = jac(PairedDedupOps.captionFor(i),
        PairedDedupOps.captionFor(i + 2000L))
      assert(j12 < PairedDedupOps.CaptionJaccard,
        s"seed $i: disjoint template must sit below the floor ($j12)")
    }
  }
}
