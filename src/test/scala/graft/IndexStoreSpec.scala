package graft

import java.nio.file.Files

import graft.store.{GraftStore, IndexStore}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Persisted-index lifecycle over the store manifest: build/append
  * commit index leaves atomically, search probes them AT REST — a fresh
  * [[GraftStore]] instance per step is the process-restart story (the
  * only state is the manifest on disk). The band kind is exercised
  * end-to-end through the CLI in CliSpec; here the span and sketch kinds
  * and the replace-on-rebuild contract. */
class IndexStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def doc(id: Long, tag: String): (Long, String) =
    (id, (0 until 60).map(j => s"$tag${id}w$j").mkString(" "))

  test("span index: at-rest probe finds a substring dup across restarts") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-idx-span").toString
    val corpus = (0L until 30L).map(doc(_, "s"))
    IndexStore.build(new GraftStore(root), "span",
      corpus.toDF("doc_id", "text"))
    // probe: a 200-char slice of doc 11 with a fresh tail — a substring
    // dup whole-doc fingerprints miss; only the probe doc is shingled,
    // the corpus text is never re-read (it isn't even passed in)
    val probe = Seq(
      (700L, corpus(11)._2.substring(40, 240) + " fresh tail here"),
      doc(701L, "z"))
    val hits = IndexStore.search(new GraftStore(root), spark, "span",
      probe.toDF("doc_id", "text"))
      .select("new_id", "existing_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.contains((700L, 11L)))
    assert(!hits.exists(_._1 == 701L))
  }

  test("sketch index: at-rest ANN probe ranks the near-identical vector " +
      "first") {
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(7)
    val root = Files.createTempDirectory("graft-idx-sketch").toString
    val base = (0L until 200L).map(i =>
      (i, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
    IndexStore.build(new GraftStore(root), "sketch",
      base.toDF("vec_id", "embedding"))
    // query 9000: vector 42 nudged — its exact neighbor must rank 1
    val q = Seq((9000L, base(42)._2.map(_ * 1.001f)))
    val top = IndexStore.search(new GraftStore(root), spark, "sketch",
      q.toDF("vec_id", "embedding"))
      .filter(col("rank") === 1).collect()
    assert(top.length == 1)
    assert(top.head.getAs[Long]("query_id") == 9000L)
    assert(top.head.getAs[Long]("neighbor_id") == 42L)
  }

  test("ivf index: cells are manifest-pruned leaves; append lands new " +
      "vectors in existing cells; probe finds the neighbor") {
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(3)
    // clustered corpus — the regime where IVF is the right index
    val centers = (0 until 8).map(_ =>
      Array.fill(dim)(rnd.nextGaussian()))
    def point(c: Int): Seq[Float] =
      centers(c).map(x => (x + 0.08 * rnd.nextGaussian()).toFloat).toSeq
    val base = (0L until 400L).map(i => (i, point((i % 8).toInt)))
    val root = Files.createTempDirectory("graft-idx-ivf").toString
    IndexStore.build(new GraftStore(root), "ivf",
      base.toDF("vec_id", "embedding"))
    // one leaf per populated cell + the centroid model table, all in
    // one committed snapshot — the layout manifest pruning needs
    val s = new GraftStore(root)
    val cellLeaves = s.leavesOf("ivf_cells")
    assert(cellLeaves.size > 1, "want per-cell leaves")
    assert(cellLeaves.map(_.bucket).distinct.size == cellLeaves.size)
    assert(s.leavesOf("ivf_centroids").size == 1)
    // append: model fixed, new vectors land in their nearest cells
    val extra = (5000L until 5040L).map(i => (i, point((i % 8).toInt)))
    IndexStore.append(new GraftStore(root), "ivf",
      extra.toDF("vec_id", "embedding"))
    // probe a nudged copy of an APPENDED vector: found at rank 1, via a
    // search that only reads the probed cells' leaves
    val q = Seq((9000L, extra.head._2.map(_ * 1.001f)))
    val top = IndexStore.search(new GraftStore(root), spark, "ivf",
      q.toDF("vec_id", "embedding"))
      .filter(col("rank") === 1).collect()
    assert(top.length == 1)
    assert(top.head.getAs[Long]("neighbor_id") == 5000L)
  }

  test("bucket predicates prune index reads to fewer files; an " +
      "all-miss probe keeps the schema") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-idx-prune").toString
    val store = new GraftStore(root)
    IndexStore.build(store, "span",
      (0L until 30L).map(doc(_, "p")).toDF("doc_id", "text"))
    val full = IndexStore.read(store, spark, "span")
    val liveBuckets = store.leavesOf("span_index").map(_.bucket).toSet
    assert(liveBuckets.size > 4, s"want many buckets: $liveBuckets")
    val one = IndexStore.read(store, spark, "span",
      Set(liveBuckets.head).contains)
    assert(one.inputFiles.length < full.inputFiles.length)
    assert(one.count() > 0 && one.count() < full.count())
    // a probe that misses every live bucket: empty result, full schema
    val none = IndexStore.read(store, spark, "span", _ => false)
    assert(none.count() == 0)
    assert(none.columns.toSeq == full.columns.toSeq)
  }

  test("rebuild replaces the old index in one commit; append extends it") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-idx-rebuild").toString
    val a = (0L until 20L).map(doc(_, "a")).toDF("doc_id", "text")
    val b = (100L until 110L).map(doc(_, "b")).toDF("doc_id", "text")
    val s1 = new GraftStore(root)
    IndexStore.build(s1, "span", a)
    IndexStore.append(s1, "span", b)
    val s2 = new GraftStore(root)
    val both = IndexStore.read(s2, spark, "span")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(both.exists(_ < 20L) && both.exists(_ >= 100L))
    // rebuild from b alone: a's rows are gone in the same snapshot swap
    IndexStore.build(s2, "span", b)
    val after = IndexStore.read(new GraftStore(root), spark, "span")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(after.forall(_ >= 100L), s"stale rows survived: $after")
  }
}
