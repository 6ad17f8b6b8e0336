package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the properties that make these queries scale
  * (filter pushdown to parquet, column pruning, broadcast joins for
  * dimension sides, whole-stage codegen) must hold, not just the results.
  */
class PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    // execute THIS df so AQE materializes its final plan (count() would
    // execute a different QueryExecution)
    df.collect()
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("conjunctive filter pushes both predicates to the parquet scan") {
    val p = plan("fil5_conjunctive")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("IsNotNull(l_suppkey)") || p.contains("EqualTo(l_suppkey,4)"),
      s"expected l_suppkey pushdown in:\n$p")
    assert(p.contains("GreaterThan(l_discount,0.05)"),
      s"expected l_discount pushdown in:\n$p")
  }

  test("range predicate pushes bounds to the scan") {
    val p = plan("fil4_range")
    assert(p.contains("GreaterThanOrEqual(o_orderkey,100)"), p)
    assert(p.contains("LessThanOrEqual(o_orderkey,120)"), p)
  }

  test("narrow projection prunes the read schema to selected columns") {
    val p = plan("prj1_narrow")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey"), readSchema)
    assert(!readSchema.contains("l_shipdate"), readSchema)
    assert(!readSchema.contains("l_returnflag"), readSchema)
  }

  test("enrichment join broadcasts both dimension sides") {
    val p = plan("join1_enrich")
    // formatted output lists each node once in the tree and once in the
    // details — count the numbered detail headers
    assert("\\(\\d+\\) BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("headline aggregate runs partial+final hash aggregation in codegen") {
    val p = plan("q1_agg")
    assert("\\(\\d+\\) HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("[codegen id :"), p)
  }

  test("approximate top-terms partial-aggregates map-side: capacity rows " +
      "per partition cross the exchange, not one per distinct term") {
    val p = plan("text_top_terms_approx")
    // TypedImperativeAggregate plans as ObjectHashAggregate with a
    // partial mode below the exchange — the map-side combine that makes
    // the MG summary's shuffle O(capacity), not O(distinct terms)
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_mgtopkagg") || p.contains("partial_mg_top_k"),
      s"expected a partial MG aggregate below the exchange in:\n$p")
  }

  test("mixture membership joins the broadcast rate table — document " +
      "rows never shuffle") {
    // both mixture forms reduce to one corpus scan filtered against an
    // O(langs) broadcast; a SortMergeJoin here would shuffle every doc
    // row by lang (skewed: one hot partition per head language)
    for (q <- Seq("sample_mixture", "sample_mixture_alpha")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: $p")
      assert(!p.contains("SortMergeJoin"), s"$q: $p")
    }
  }

  test("top-1 sort-limit plans TakeOrderedAndProject, not a global sort") {
    val p = plan("srt1_top1")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("union with per-branch predicates pushes filters below the union") {
    val p = plan("set1_union_all")
    // every branch scans with its own pushed filter — no post-union filter
    assert("PushedFilters: \\[.*c_nationkey".r.findAllIn(p).nonEmpty, p)
    assert(p.contains("Union"), p)
  }

  test("scalar-subquery max reuses a single-row subquery, not a rescan join") {
    val p = plan("agg3_scalar_subquery")
    assert(p.contains("Subquery") || p.contains("scalar-subquery"), p)
  }

  test("decode pipeline: selector filter pushes down; joins broadcast") {
    val df = graft.chain.ChainQueries.tokenTransfersPipeline.fn(spark, dir)
    df.count()
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("Generate"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("brute-force ANN broadcasts the query side") {
    val p = plan("ann_topk_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("sketch ANN broadcasts queries and windows per query_id (no global sort)") {
    val p = plan("ann_topk_lsh")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    // every ranking window partitions by query_id — never a global Window
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("query_id")), p)
  }

  test("IVF ANN broadcasts probes and centroids; windows per query_id") {
    val p = plan("ann_topk_ivf")
    // the probe list is O(queries·nprobe) and the centroid table is
    // O(k·dim) — both broadcast, so the corpus (cells) side never
    // shuffles for a join; every ranking window partitions by query_id
    // (a global Window here would serialize the search on one task)
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("query_id")), p)
  }

  test("PQ at-rest probe: the candidate scan reads codes WITHOUT the " +
      "unit column (the 50x-bytes claim is a plan property)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-plan-pq").toString
    val rnd = new scala.util.Random(5)
    val base = (0L until 200L).map(i =>
      (i, Seq.fill(16)(rnd.nextGaussian().toFloat)))
    graft.store.IndexStore.build(new graft.store.GraftStore(root), "pq",
      base.toDF("vec_id", "embedding"))
    val df = graft.store.IndexStore.search(new graft.store.GraftStore(root),
      spark, "pq", Seq((9000L, base(7)._2.map(_ * 1.001f)))
        .toDF("vec_id", "embedding"))
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val schemas = p.linesIterator.filter(_.contains("ReadSchema"))
      .filter(_.contains("codes")).toSeq
    // the candidate-stage scan projects (vec_id, codes) only — unit
    // bytes stay on disk until the survivor fetch (its own scan)
    assert(schemas.nonEmpty, s"no codes scan in:\n$p")
    assert(schemas.exists(!_.contains("unit")),
      s"every codes scan also reads unit:\n${schemas.mkString("\n")}")
    graft.store.GraftStore.deleteTree(java.nio.file.Paths.get(root))
  }

  test("IVF-PQ at-rest probe: the ADC scan reads (cell, codes) WITHOUT " +
      "the unit column") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-plan-ivfpq").toString
    val rnd = new scala.util.Random(5)
    val base = (0L until 200L).map(i =>
      (i, Seq.fill(16)(rnd.nextGaussian().toFloat)))
    graft.store.IndexStore.build(new graft.store.GraftStore(root), "ivfpq",
      base.toDF("vec_id", "embedding"))
    val df = graft.store.IndexStore.search(new graft.store.GraftStore(root),
      spark, "ivfpq", Seq((9000L, base(7)._2.map(_ * 1.001f)))
        .toDF("vec_id", "embedding"))
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val schemas = p.linesIterator.filter(_.contains("ReadSchema"))
      .filter(_.contains("codes")).toSeq
    assert(schemas.nonEmpty, s"no codes scan in:\n$p")
    assert(schemas.exists(!_.contains("unit")),
      s"every codes scan also reads unit:\n${schemas.mkString("\n")}")
    graft.store.GraftStore.deleteTree(java.nio.file.Paths.get(root))
  }

  test("PQ and IVF-PQ searches keep the map-side rank-limit pushdown: " +
      "a Partial WindowGroupLimit bounds the ADC candidates BEFORE the " +
      "exchange") {
    // The candidate ranking (row_number over query_id ordered by adist,
    // capped at RescoreBudget) is scale-safe only because Spark's
    // InferWindowGroupLimit rule inserts a Partial-mode WindowGroupLimit
    // below the shuffle — each map task forwards at most
    // RescoreBudget+1 rows per query instead of its full ADC output.
    // That pushdown exists by optimizer grace: it requires the limit to
    // be a foldable literal and the filter shape rank <= K. A refactor
    // that makes RescoreBudget non-literal or reshapes the filter loses
    // it SILENTLY (results stay correct, the full candidate set
    // shuffles into 10 reducer partitions at corpus scale) — so pin it,
    // like the ObjectHashAggregate pin for approximate top-k.
    for (q <- Seq("ann_topk_pq", "ann_topk_ivfpq")) {
      val p = plan(q)
      // the formatted detail block renders the node as
      //   (N) WindowGroupLimit
      //   Arguments: [query_id], [adist ASC, vec_id ASC],
      //     row_number(), <budget>, Partial
      val budget = graft.operators.SimilarityOps.RescoreBudget
      val blocks = p.split("\n\n").filter(_.contains("WindowGroupLimit"))
      assert(blocks.exists(b => b.contains(s" $budget, Partial") &&
          b.contains("adist")),
        s"$q: no map-side (Partial) WindowGroupLimit at the " +
          s"$budget-candidate ADC ranking — it shuffles unbounded:\n$p")
    }
  }

  test("filtered ANN pre-filters: the label predicate is the broadcast " +
      "join key, not a post-rank filter") {
    val p = plan("ann_topk_filtered")
    // candidates meet queries through a label-keyed broadcast hash join
    // — a candidate outside the query's label partition is never ranked
    // (the join keys live in the node's detail block, not the tree line)
    assert(p.split("\n\n").exists(b => b.contains("BroadcastHashJoin") &&
        b.contains("Left keys") && b.contains("label")),
      s"no label-keyed broadcast join:\n$p")
  }

  test("ngram verify stage is bounded by candidates (semi-join prune)") {
    val df = SparkEntry.queries("dedup_ngram_jaccard")(spark, dir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the gram-side scan joins LeftSemi against candidate ids before any
    // gram array is built — the wide column never covers the full corpus
    assert(p.contains("LeftSemi"), p)
  }

  test("salted aggregate fans the hot key across salts (keyed phase-1 exchange)") {
    val p = plan("skew_salted_agg")
    // phase 1 exchanges on (__key, __salt) — the hot key spreads over 16
    // reducers; phase 2 exchanges on __key alone to merge partials
    assert(p.contains("__salt"), p)
    assert(p.contains("hashpartitioning(__key"), p)
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size >= 2, p)
  }

  test("salted join replicates the small side and joins on (key, salt)") {
    val p = plan("skew_salted_join")
    // the small side fans out via explode(sequence(0..salts-1)) — a
    // Generate node — and the equi-join condition carries the salt
    assert(p.contains("Generate"), p)
    assert(p.contains("__salt"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("as-of join is one keyed shuffle + window — no join operator at all") {
    val p = plan("join_asof")
    // the union-and-window formulation: the only join in the plan is the
    // tie-collapse pre-aggregation's absence — no Join node, no range
    // explosion; one hash exchange on the key feeds the window sort
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
    assert(p.contains("hashpartitioning(__k"), p)
  }

  test("bucketed range join plans an equi-join, not a nested loop") {
    val p = plan("join_range_bucketed")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("stratified sample broadcasts the rates side (no corpus shuffle)") {
    val p = plan("sample_stratified")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("mixture sample broadcasts the rates side (no corpus shuffle)") {
    val p = plan("sample_mixture")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("shared-span pairing shuffles by fingerprint, never a single partition") {
    val df = SparkEntry.queries("dedup_shared_spans")(spark, dir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the df gate's window partitions by fp (hash exchange, parallel) —
    // a global Window would show Exchange SinglePartition
    assert(p.contains("hashpartitioning(fp"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("incremental span probe joins the postings index without re-winnowing") {
    val df = SparkEntry.queries("dedup_spans_incremental")(spark, dir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
      .split("== Initial Plan ==")(0) // AQE appends the pre-adaptive plan
    // index side is a materialized checkpoint scan (built once, broadcast)
    // — not a re-derivation: the probe side holds the only winnow call
    assert(p.contains("Scan ExistingRDD"), p)
    assert("winnowfps".r.findAllIn(p.toLowerCase).size <= 1, p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("line dedup: keyed exchanges only, df side partial-aggregates") {
    val df = SparkEntry.queries("dedup_lines")(spark, dir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
      .split("== Initial Plan ==")(0)
    // every data-bearing exchange is keyed (line df, keep join, per-doc
    // reassembly); the one-row n_docs scalar accounts for the only
    // single-partition funnel AND the only nested-loop join (a 1-row
    // broadcast cross join plans as BroadcastNestedLoopJoin). No
    // unkeyed join or funnel ever sees document rows.
    assert("Exchange SinglePartition".r.findAllIn(p).size == 1, p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size == 1, p)
    assert(p.contains("hashpartitioning(line"), p)
    assert(p.contains("hashpartitioning(doc_id"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the count-distinct df agg partial-aggregates before its shuffle
    assert(p.contains("partial_count"), p)
  }

  test("domain cap: one window shuffle keyed by source, nothing global") {
    val df = SparkEntry.queries("sample_domain_cap")(spark, dir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
      .split("== Initial Plan ==")(0)
    assert(p.contains("hashpartitioning(source"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    assert("Exchange ".r.findAllIn(p).size == 1, p)
  }

  test("multimodal frame fan-out stays in the scan stage (no exchange)") {
    val df = SparkEntry.queries("multimodal_frames")(spark, dir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
      .split("== Initial Plan ==")(0)
    assert(!p.contains("Exchange"), p)
  }

  test("quality-weighted sample is pure scan — zero exchanges") {
    val df = SparkEntry.queries("sample_quality_weighted")(spark, dir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
      .split("== Initial Plan ==")(0)
    assert(!p.contains("Exchange"), p)
  }

  test("diversity sample is one window shuffle keyed by cell") {
    val df = SparkEntry.queries("sample_diverse")(spark, dir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
      .split("== Initial Plan ==")(0)
    assert(p.contains("hashpartitioning(cell"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    assert("Exchange ".r.findAllIn(p).size == 1, p)
  }

  test("scalable win_extras single-partitions only the bucket metadata") {
    val df = graft.operators.ExtendedOps.winExtrasScalable.fn(spark, dir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
      .split("== Initial Plan ==")(0)
    // one single-partition exchange: the one-row-per-bucket metadata window
    // (offsets + successor first-key + total). The orders rows themselves
    // shuffle by bucket hash; both metadata frames come back as broadcasts.
    assert("Exchange SinglePartition".r.findAllIn(p).size == 1, p)
    assert(p.contains("hashpartitioning(b"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("scalable gap check single-partitions only the bucket summaries") {
    val df = SparkEntry.queries("win1_gap_check_scalable")(spark, dir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
      .split("== Initial Plan ==")(0)
    // per-bucket lag windows over the keys (hash-partitioned by bucket) +
    // ONE single-partition window over one row per bucket — the boundary
    // lag that pairs each bucket with its predecessor NON-EMPTY bucket
    assert("Exchange SinglePartition".r.findAllIn(p).size == 1, p)
    assert(p.contains("hashpartitioning("), p)
  }

  test("scalable row-number check single-partitions only bucket offsets") {
    val df = SparkEntry.queries("win2_row_number_scalable")(spark, dir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
      .split("== Initial Plan ==")(0)
    assert("Exchange SinglePartition".r.findAllIn(p).size == 1, p)
    assert(p.contains("hashpartitioning("), p)
  }

  test("scalable identity check single-partitions only the per-bucket offsets") {
    val blocks = graft.chain.ChainFixture.build(200).blocksDF(spark)
    val df = graft.chain.ChainOps.identityMismatchesScalable(blocks, 50L)
    df.collect()
    // simple mode renders the executed plan once (formatted repeats it as
    // Initial Plan); exactly ONE single-partition exchange must remain —
    // the one-row-per-bucket cumulative-offsets window. The data side
    // shuffles by bucket hash.
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
      .split("== Initial Plan ==")(0) // AQE appends the pre-adaptive plan
    assert("Exchange SinglePartition".r.findAllIn(p).size == 1, p)
    assert(p.contains("hashpartitioning("), p)
  }

  /** Output column names of every shuffle exchange in the executed
    * plan (AQE final), shuffle-byte-shape evidence for the claims
    * below. */
  private def shuffleOutputs(
      df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] = {
    df.collect()
    val plan = df.queryExecution.executedPlan
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(s.plan)
      case other => other.children
    }
    def collectEx(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[Seq[String]] = {
      val here = p match {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          Seq(e.output.map(_.name).toSeq)
        case _ => Nil
      }
      here ++ unwrap(p).flatMap(collectEx)
    }
    collectEx(plan)
  }

  test("image phash dedup: pixel payloads never cross a shuffle — " +
      "every exchange carries hash/band rows only") {
    val df = SparkEntry.queries("multimodal_phash_dedup")(spark, dir)
    val exs = shuffleOutputs(df)
    assert(exs.nonEmpty, "expected at least the band-join exchange")
    exs.foreach(cols => assert(!cols.exists(_.contains("payload")),
      s"an exchange carries image payload bytes: $cols"))
  }

  test("audio afp dedup: payload bytes never cross a shuffle — " +
      "every exchange carries fingerprint/band rows only") {
    val df = SparkEntry.queries("multimodal_audio_dedup")(spark, dir)
    val exs = shuffleOutputs(df)
    assert(exs.nonEmpty, "expected at least the band-join exchange")
    exs.foreach(cols => assert(!cols.exists(_.contains("payload")),
      s"an exchange carries audio payload bytes: $cols"))
  }

  test("perceptual decontamination (all three modalities): the " +
      "benchmark side broadcasts — no exchange carries payload bytes") {
    for (q <- Seq("multimodal_decontaminate",
        "multimodal_audio_decontaminate",
        "multimodal_video_decontaminate")) {
      val df = SparkEntry.queries(q)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastExchange"),
        s"$q: benchmark side must broadcast:\n$plan")
      val exs = shuffleOutputs(df)
      // the ONLY tolerated shuffles are the distinct/verdict
      // aggregations over match rows — never payload bytes
      exs.foreach(cols => assert(!cols.exists(_.contains("payload")),
        s"$q: an exchange carries payload bytes: $cols"))
    }
  }

  test("video frame dedup: frame payload bytes never cross a shuffle — " +
      "every exchange carries hash/band rows only") {
    val df = SparkEntry.queries("multimodal_video_dedup")(spark, dir)
    val exs = shuffleOutputs(df)
    assert(exs.nonEmpty, "expected at least the band-join exchange")
    exs.foreach(cols => assert(!cols.exists(_.contains("payload")),
      s"an exchange carries frame payload bytes: $cols"))
  }

  test("exact spans: the postings screen exchange carries only " +
      "(doc_id, pos, h) — 20-byte rows, never text or token arrays") {
    val df = SparkEntry.queries("dedup_exact_spans")(spark, dir)
    val exs = shuffleOutputs(df)
    // the screen exchange is the one partitioned work over `h`
    val screen = exs.filter(_.contains("h"))
    assert(screen.nonEmpty, s"no postings exchange found in: $exs")
    screen.foreach(cols => assert(
      cols.toSet.subsetOf(Set("doc_id", "pos", "h")),
      s"postings exchange carries more than (doc_id, pos, h): $cols"))
    // raw text never shuffles anywhere; token arrays may cross only
    // the candidate-pruned certify join, never the corpus-wide screen
    exs.foreach(cols => assert(!cols.contains("text"),
      s"an exchange carries raw text: $cols"))
  }

  test("span removal: the rewrite joins cut metadata against the " +
      "corpus without shuffling text — no exchange carries the text " +
      "column (ranges broadcast at this scale)") {
    val df = SparkEntry.queries("dedup_spans_removed")(spark, dir)
    val exs = shuffleOutputs(df)
    // the certification screen is still the only corpus-sized exchange
    assert(exs.exists(_.contains("h")),
      s"no postings exchange found in: $exs")
    exs.foreach(cols => assert(!cols.contains("text"),
      s"an exchange carries raw text: $cols"))
  }
}
