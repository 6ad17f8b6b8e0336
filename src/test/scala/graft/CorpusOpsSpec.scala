package graft

import graft.operators.CorpusOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The scalable global-order operators (packChunks, sampleShuffle) must
  * equal their naive global-window twins on multi-partition input, for
  * ANY bucketing — the bucket decomposition is a physical choice, never
  * visible in results. (Exact values are additionally gated by the
  * DuckDB oracles at sf0.01; these specs pin the equivalence argument
  * itself plus the plan shape that makes the decomposition scale.)
  */
class CorpusOpsSpec extends AnyFunSuite with BeforeAndAfterAll
    with TempDirCleanup {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  /** Multi-partition corpus with ragged doc lengths and sparse, unsorted
    * doc_ids (gaps force empty buckets at small bucket sizes). */
  private def corpus: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val ids = rnd.shuffle((0L until 400L).map(_ * 3 + (rnd.nextInt(2))))
    ids.map { id =>
      val words = (0 to (id % 17).toInt).map(j => f"w$id%04d$j%02d")
      (id, words.mkString(" "))
    }.toDF("doc_id", "text").repartition(7)
  }

  private def collectSorted(df: DataFrame): Seq[Seq[Any]] =
    df.orderBy("doc_id").collect().toSeq.map(_.toSeq)

  test("shard export: balanced sizes, rank-ordered files, lossless round-trip") {
    val out = tempDir("graft_shards")
    try {
      val nShards = CorpusOps.writeShards(corpus, out, docsPerShard = 64L)
      val n = corpus.count()
      assert(nShards == (n + 63) / 64)
      val back = spark.read.parquet(out)
      assert(back.count() == n) // lossless
      // every shard holds exactly 64 docs (last one partial) and a
      // CONTIGUOUS rank range — the streaming-order property
      val shards = back.select("shard", "shuffle_rank").collect()
        .map(r => (r.getAs[Number]("shard").longValue(),
          r.getAs[Long]("shuffle_rank")))
        .groupBy(_._1).toSeq.sortBy(_._1)
      shards.foreach { case (shard, rows) =>
        val ranks = rows.map(_._2).sorted
        assert(ranks.head == shard * 64 + 1 && ranks.last == ranks.head +
          ranks.length - 1, s"shard $shard ranks not contiguous")
        if (shard < nShards - 1) assert(ranks.length == 64)
      }
      // each shard directory holds ONE data file (rank-sorted write)
      val dirs = new java.io.File(out).listFiles()
        .filter(_.getName.startsWith("shard="))
      assert(dirs.length == nShards)
      dirs.foreach { d =>
        assert(d.listFiles().count(_.getName.endsWith(".parquet")) == 1,
          s"${d.getName} not a single file")
      }
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(out))
    }
  }

  test("shard _stats sidecar audits the written shards exactly and stays " +
      "invisible to shard readers") {
    import spark.implicits._
    val out = tempDir("graft_shard_stats")
    try {
      val langed = corpus.withColumn("lang",
        when(col("doc_id") % 3 === 0, "en").otherwise("fr"))
      CorpusOps.writeShards(langed, out, docsPerShard = 64L)
      val audited = CorpusOps.writeShardStats(spark, out)
      val stats = spark.read.parquet(s"$out/_stats").collect()
        .map(r => r.getAs[Number]("shard").longValue() ->
          (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
            r.getAs[Long]("total_chars"),
            r.getSeq[String](r.fieldIndex("langs")).toSet)).toMap
      assert(audited == stats.size.toLong)
      // recount straight from the shards: the sidecar must match exactly
      val recount = spark.read.parquet(out)
        .groupBy("shard").agg(
          count(lit(1)).as("n"),
          sum(size(split(col("text"), "\\s+")).cast("long")).as("t"),
          sum(length(col("text")).cast("long")).as("c"),
          sort_array(collect_set(col("lang"))).as("l"))
        .collect().map(r => r.getAs[Number]("shard").longValue() ->
          (r.getAs[Long]("n"), r.getAs[Long]("t"), r.getAs[Long]("c"),
            r.getSeq[String](r.fieldIndex("l")).toSet)).toMap
      assert(stats == recount)
      // the sidecar does not leak into the shard read (underscore rule)
      assert(spark.read.parquet(out).count() == langed.count())
      assert(!spark.read.parquet(out).columns.contains("n_docs"))
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(out))
    }
  }

  test("packChunks equals its naive global-window twin, any bucket size") {
    val want = collectSorted(CorpusOps.packChunksNaive(corpus))
    for (bs <- Seq(1L, 7L, 100L, 1000000L, 0L)) // 0 = adaptive default
      assert(collectSorted(CorpusOps.packChunks(corpus, bs)) == want,
        s"bucketSize=$bs diverged from the naive twin")
  }

  test("sampleShuffle equals its naive twin, any prefix width") {
    val want = collectSorted(CorpusOps.sampleShuffleNaive(corpus))
    for (nib <- Seq(1, 2, 3, 0)) // 0 = adaptive default
      assert(collectSorted(CorpusOps.sampleShuffle(corpus, nib)) == want,
        s"nibbles=$nib diverged from the naive twin")
  }

  test("sampleShuffle is a permutation: ranks are 1..n exactly once") {
    val n = corpus.count()
    val ranks = CorpusOps.sampleShuffle(corpus)
      .select("shuffle_rank").collect().map(_.getLong(0)).sorted
    assert(ranks.toSeq == (1L to n).toSeq)
  }

  test("adaptive bucket sizing bounds the bucket count") {
    // doc_id up to ~40e9 would naively make 400M buckets at size 100;
    // the derived size must cap buckets at TargetBuckets.
    val maxId = 40L * 1000 * 1000 * 1000
    import spark.implicits._
    val d = Seq((0L, "a b"), (maxId / 2, "c"), (maxId, "d e f"))
      .toDF("doc_id", "text")
    val got = collectSorted(CorpusOps.packChunks(d))
    assert(got == collectSorted(CorpusOps.packChunksNaive(d)))
    // the plan's bucket expression uses the derived size, not 100
    val bs = math.max(100L, maxId / CorpusOps.TargetBuckets + 1L)
    assert(maxId / bs + 1 <= CorpusOps.TargetBuckets)
  }

  test("scalable forms keep the data-row windows bucket-partitioned") {
    // No Window with an empty partition spec may touch data rows: the
    // only global-order window allowed is the one over per-bucket totals.
    def dataRowGlobalWindows(df: DataFrame): Seq[String] = {
      val plan = df.queryExecution.optimizedPlan
      plan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty &&
              w.child.output.exists(_.name == "n_tokens") =>
          w.simpleString(100)
      }
    }
    assert(dataRowGlobalWindows(CorpusOps.packChunks(corpus, 100L)).isEmpty)
    // the naive twin, by contrast, has exactly the global window
    assert(dataRowGlobalWindows(CorpusOps.packChunksNaive(corpus)).nonEmpty)
  }
}
