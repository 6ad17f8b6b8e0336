package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale harness (round 10): runs the flagship composed paths
  * at multiples of the sf0.1 corpus and records runtime, shuffle volume
  * and memory per point — the measurement behind SCALE.md's claims. The
  * plan-asserted scale story (banded joins, bucket caps, manifest-pruned
  * probes) predicts:
  *
  *   - corpus-bound phases (curation_pipeline, dedup_minhash_lsh, index
  *     builds, pack/shuffle) grow ~linearly in corpus size, in BOTH
  *     wall-clock and shuffled bytes (a k² step would bend these);
  *   - probe phases against an at-rest index (band_probe, ivf_search)
  *     stay ~flat in wall-clock as the INDEX grows, because the probe
  *     batch is fixed and the manifest prunes unprobed buckets/cells;
  *   - driver heap stays bounded (no phase collects row data).
  *
  * Corpus synthesis: replica i of `documents` shifts doc_id by i·10⁷ and
  * prefixes every token with `r<i>`, so each replica keeps the base
  * corpus's internal near-dup structure while sharing NO shingles across
  * replicas — duplicate pairs grow ~linearly with the corpus, like a
  * real crawl, instead of quadratically like verbatim replication would.
  * `embeddings` replicas shift vec_id only (duplicate vectors just add
  * cluster mass; all timed paths are insensitive to that). Probe batches
  * are always built from the BASE corpus, so probe work is constant by
  * construction and any growth measured is the index's fault.
  *
  * Usage: `graft.Scale` main; env SPARK_GRAFT_SF_DIR (base corpus,
  * default sf0.1), SPARK_GRAFT_SCALE_POINTS (default "1,3,10,30"),
  * SPARK_GRAFT_SCALE_PHASES (phase filter for focused reruns),
  * SPARK_GRAFT_SCALE_DIR (work dir, default /tmp/graft-scale). A full
  * sweep writes SCALE.json in the cwd; a filtered rerun writes
  * SCALE_partial.json so it can never clobber committed evidence. One
  * JSON line per phase on stdout as it runs. Like Bench, a fixed CPU
  * sentinel runs before every phase so ambient box load is visible in
  * the output (the per-phase `sentinel_ms` sample; compare against the
  * run's minimum to judge a phase's load environment). */
object Scale {

  private val ReplicaOffset = 10000000L

  /** Per-task metric accumulation across every job of a phase. */
  private final class Metrics extends SparkListener {
    val shw = new java.util.concurrent.atomic.AtomicLong
    val shr = new java.util.concurrent.atomic.AtomicLong
    val outw = new java.util.concurrent.atomic.AtomicLong
    val peak = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        shw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shr.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        // task output bytes (parquet staging) — the REWRITE term of the
        // destructive verbs, invisible to the shuffle counters (a
        // zero-shuffle prune still pays its staged leaves here)
        outw.addAndGet(m.outputMetrics.bytesWritten)
        peak.accumulateAndGet(m.peakExecutionMemory, (a, b) => math.max(a, b))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val points = sys.env.getOrElse("SPARK_GRAFT_SCALE_POINTS", "1,3,10,30")
      .split(',').map(_.trim.toInt).toSeq
    val workRoot = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      "/tmp/graft-scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new Metrics
    spark.sparkContext.addSparkListener(metrics)

    def sentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 4000000L, 1L, 8)
        .selectExpr("bit_xor(xxhash64(id))").head()
      (System.nanoTime() - t0) / 1e9
    }
    sentinel() // codegen warm

    // ---- corpus synthesis --------------------------------------------
    def synth(k: Int): String = {
      val dir = s"$workRoot/x$k"
      // resume only when BOTH tables landed with their _SUCCESS markers
      // — a sweep that died mid-synthesis must re-synthesize, not skip
      // forever on a half-written point
      def done(t: String) = java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/$t.parquet/_SUCCESS"))
      if (!(done("documents") && done("embeddings"))) {
        val docs = spark.read.parquet(s"$baseDir/documents.parquet")
        val scaledDocs = (0 until k).map { i =>
          if (i == 0) docs
          else docs
            .withColumn("doc_id", col("doc_id") + lit(i * ReplicaOffset))
            .withColumn("text",
              regexp_replace(col("text"), "(\\S+)", s"r$i" + "$1"))
            .withColumn("n_chars", length(col("text")))
        }.reduce(_ unionAll _)
        scaledDocs.repartition(32)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        val emb = spark.read.parquet(s"$baseDir/embeddings.parquet")
        (0 until k).map { i =>
          if (i == 0) emb
          else emb.withColumn("vec_id", col("vec_id") + lit(i * ReplicaOffset))
        }.reduce(_ unionAll _)
          .repartition(32)
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      }
      dir
    }

    // ---- measurement -------------------------------------------------
    val out = Seq.newBuilder[String]
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def heapMb(): Long = {
      val r = Runtime.getRuntime
      System.gc()
      (r.totalMemory() - r.freeMemory()) / (1024 * 1024)
    }

    /** Time `body` (forced by .count()), with a sentinel before it and
      * task-metric deltas around it. `reps`: min over this many runs
      * (cheap probe phases damp load noise; builds run once). */
    def phase(name: String, k: Int, reps: Int)(body: => DataFrame): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val s0 = sentinel()
      val (shw0, shr0) = (metrics.shw.get(), metrics.shr.get())
      val outw0 = metrics.outw.get()
      metrics.peak.set(0L)
      var best = Double.MaxValue
      var rows = 0L
      try (1 to reps).foreach { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(false))
        val t0 = System.nanoTime()
        rows = body.count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          // a failed phase records -1 and the run continues — one broken
          // path must not cost the whole sweep's evidence
          println(s"""{"phase":"$name","k":$k,"sec":-1,"err":"${
            e.getClass.getSimpleName}"}""")
          out += s"""{"phase":"$name","k":$k,"sec":-1}"""
          return
      }
      // metric deltas span every rep — report per-rep so probe phases
      // (reps=2) stay comparable with single-rep builds
      val line = s"""{"phase":"$name","k":$k,"sec":${fmt(best)},""" +
        s""""rows":$rows,"shuffle_write_mb":${
          (metrics.shw.get() - shw0) / reps / (1024 * 1024)},""" +
        s""""shuffle_read_mb":${
          (metrics.shr.get() - shr0) / reps / (1024 * 1024)},""" +
        s""""output_write_mb":${
          (metrics.outw.get() - outw0) / reps / (1024 * 1024)},""" +
        s""""peak_task_mem_mb":${metrics.peak.get() / (1024 * 1024)},""" +
        s""""driver_heap_mb":${heapMb()},"sentinel_ms":${
          math.round(s0 * 1000)}}"""
      println(line)
      out += line
    }

    // fixed probe batches from the BASE corpus — constant across k. Built
    // fresh per use (NOT localCheckpoint'd: phase() unpersists all RDD
    // blocks between runs, which would orphan a checkpoint); the lineage
    // is one 5000-row parquet read + filter, constant noise.
    def probeBatch: DataFrame = graft.operators.DedupOps.perturbedCopies(
      spark.read.parquet(s"$baseDir/documents.parquet")
        .select(col("doc_id"), col("text")))
    def queryBatch: DataFrame =
      spark.read.parquet(s"$baseDir/embeddings.parquet")
        .filter(col("vec_id") < 10)

    // Local-iteration aid: run only the named phases (probe-only reruns
    // reuse the stores a previous full sweep built).
    val onlyPhases = sys.env.get("SPARK_GRAFT_SCALE_PHASES")
      .map(_.split(',').map(_.trim).toSet)
    def want(p: String): Boolean = onlyPhases.forall(_.contains(p))

    points.foreach { k =>
      val dir = synth(k)
      val q = SparkEntry.queries

      // corpus-bound query paths (linear claim)
      if (k <= 10 && want("curation_pipeline"))
        phase("curation_pipeline", k, 1)(q("curation_pipeline")(spark, dir))
      if (want("dedup_minhash_lsh"))
        phase("dedup_minhash_lsh", k, 1)(q("dedup_minhash_lsh")(spark, dir))
      if (want("pack_chunks"))
        phase("pack_chunks", k, 1)(q("pack_chunks")(spark, dir))
      if (want("sample_shuffle"))
        phase("sample_shuffle", k, 1)(q("sample_shuffle")(spark, dir))
      if (want("exact_spans"))
        phase("exact_spans", k, 1)(q("dedup_exact_spans")(spark, dir))
      // span REMOVAL over the same k x corpus (claim: tracks the
      // exact_spans curve — the rewrite adds no corpus-sized exchange
      // beyond the certification screen; the cut metadata broadcasts)
      // the filter FORCES the rewrite: a bare count() lets Catalyst
      // eliminate the (unique-keyed) outer join and prune the cut
      // expressions — measured 0.4 s flat at every k, i.e. nothing
      if (want("spans_removed"))
        phase("spans_removed", k, 1)(
          q("dedup_spans_removed")(spark, dir)
            .filter(col("removed_tokens") >= 0))

      // at-rest index lifecycle: build at k× (linear claim), then probe
      // a FIXED batch (flat claim — manifest prunes unprobed buckets)
      val storeRoot = s"$dir/store"
      // a lifecycle rerun (append/compact/stream) without band_build
      // still needs a FRESH index — reusing a previous sweep's store
      // would re-append the same doc_ids and skew the numbers with
      // duplicates — so the store is wiped and rebuilt untimed below
      val lifecycleOnly = !want("band_build") &&
        (want("band_append") || want("band_compact") ||
          want("band_dupes") || want("band_apply") ||
          want("band_apply_dry") ||
          want("stream_curate") || want("curate_replay"))
      val rebuild = want("band_build") || want("ivf_build") || lifecycleOnly
      val sp = java.nio.file.Paths.get(storeRoot)
      if (rebuild && java.nio.file.Files.exists(sp))
        graft.store.GraftStore.deleteTree(sp)
      val store = new graft.store.GraftStore(storeRoot)
      val docsK = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val embK = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      if (want("band_build")) phase("band_build", k, 1) {
        graft.store.IndexStore.build(store, "band", docsK)
        graft.store.IndexStore.read(store, spark, "band").limit(0)
      }
      else if (lifecycleOnly) // untimed reset for the lifecycle phases
        graft.store.IndexStore.build(store, "band", docsK)
      if (want("band_probe")) phase("band_probe", k, 2)(
        graft.store.IndexStore.search(store, spark, "band", probeBatch, 0.4))
      // the rest of the index lifecycle: append a FIXED batch (claim:
      // flat — only the batch is shingled, history untouched), then
      // compact the union (claim: linear — one scan of the at-rest
      // rows, no re-shingling)
      if (want("band_append")) phase("band_append", k, 1) {
        graft.store.IndexStore.append(store, "band",
          spark.read.parquet(s"$baseDir/documents.parquet")
            .filter(col("doc_id") < 25)
            .select((col("doc_id") + 7000000L).as("doc_id"),
              regexp_replace(col("text"), "(\\S+)", "ap$1").as("text")))
        graft.store.IndexStore.read(store, spark, "band").limit(0)
      }
      if (want("band_compact")) phase("band_compact", k, 1) {
        graft.store.IndexStore.compact(store, spark, "band")
        graft.store.IndexStore.read(store, spark, "band").limit(0)
      }
      // at-rest text dup report over the k× band index (round 18 —
      // the band kind's perceptualDupes sibling). Claim: tracks the
      // dedup_minhash_lsh curve minus the shingling scan — one index
      // read (3 of 5 columns), one per-doc distinct exchange, then the
      // batch kernel's capped band join + verify; LINEAR in corpus,
      // no text read
      if (want("band_dupes")) phase("band_dupes", k, 1)(
        graft.store.IndexStore.bandDupes(store, spark))
      // streaming curate hot path (claim: per-batch cost flat in
      // history size). The batch is 25 exact duplicates of indexed
      // history (base docs, shifted ids), so every gate runs — quality,
      // intra-batch, the cross-batch probe against the k× index — and
      // every doc drops at the probe: nothing commits, the phase is
      // idempotent across reps and scale points.
      if (want("stream_curate")) phase("stream_curate", k, 2) {
        graft.streaming.StreamingCuration.processBatch(store,
          spark.read.parquet(s"$baseDir/documents.parquet")
            .filter(col("doc_id") < 25)
            .select((col("doc_id") + 8000000L).as("doc_id"), col("text")))
        graft.store.IndexStore.read(store, spark, "band").limit(0)
      }
      // epoch-cursor replay skip (round 17). An UNTIMED first run
      // commits a fresh 25-doc batch under epoch 1 — token-REVERSED
      // base docs: the quality metrics are order-invariant (same
      // length/punct/stopword ratios, so they pass the floor exactly
      // when the originals do) while 5-shingles are order-sensitive
      // (Jaccard ~0 vs the indexed corpus, so the band probe keeps
      // them) — then the timed phase replays the SAME epoch handing
      // processBatch the FULL k× corpus. Claim: O(1) — one
      // snapshot-meta read before anything else, so the replay cost
      // is flat in BOTH history size and batch size, and the k×
      // batch frame is never even evaluated.
      if (want("curate_replay")) {
        graft.streaming.StreamingCuration.processBatch(store,
          spark.read.parquet(s"$baseDir/documents.parquet")
            .filter(col("doc_id") < 25)
            .select((col("doc_id") + 9000000L).as("doc_id"),
              array_join(reverse(split(col("text"), "\\s+")), " ")
                .as("text")),
          batchId = Some(1L))
        phase("curate_replay", k, 2) {
          graft.streaming.StreamingCuration.processBatch(store,
            spark.read.parquet(s"$dir/documents.parquet")
              .select(col("doc_id"), col("text")),
            batchId = Some(1L))
          spark.range(1).toDF()
        }
      }
      // keep-one-witness APPLY over the k× at-rest report (round 18).
      // Runs LAST among the band phases: it MUTATES the store (losers
      // leave the data table and the index), so earlier band phases
      // must not see a deduped index. The data table stages untimed.
      // Claim: the band_dupes curve + connected components (driver-
      // looped narrow joins, converges in 1-2 rounds on pair-shaped
      // clusters) + a compact-class rewrite — linear, flat task memory
      if (want("band_apply") || want("band_apply_dry")) {
        store.commit(store.stageKeyed("docs", docsK,
          pmod(xxhash64(col("doc_id")),
            lit(graft.store.IndexStore.Buckets.toLong)),
          Seq(col("doc_id"))))
        // DRY-RUN sizing pass first (round 19): the simulation must
        // see the un-deduped store, and it must not mutate it — so it
        // composes with band_apply in one sweep. Claim: the
        // band_apply curve MINUS the compact-class rewrite term (same
        // report + components cost, zero bytes staged or committed)
        if (want("band_apply_dry")) phase("band_apply_dry", k, 1) {
          val res = graft.store.IndexStore.applyDupes(store, spark,
            "band", "docs", dryRun = true)
          require(res.converged,
            s"band_apply_dry did not converge at k=$k: $res")
          graft.store.IndexStore.read(store, spark, "band").limit(0)
        }
        if (want("band_apply")) phase("band_apply", k, 1) {
          val res = graft.store.IndexStore.applyDupes(store, spark,
            "band", "docs")
          // a non-converged (truncated) apply is a DIFFERENT workload —
          // it must never land as a normal linear-claim data point
          require(res.converged,
            s"band_apply did not converge at k=$k: $res")
          graft.store.IndexStore.read(store, spark, "band").limit(0)
        }
      }
      // leaf-granular prune (round 20): rewrite bytes must track the
      // DIRTY-LEAF fraction, never the index size. Two prunes over a
      // fresh band index at each k — ONE dead doc (its Bands rows
      // dirty at most 8 of the 64 content buckets) vs 10% dead docs
      // (dirtying every bucket: the old whole-index bound). Claim:
      // output bytes of the small prune ≈ the dirty-leaf fraction of
      // the bulk prune's at every k; both stay linear in k at their
      // own fraction, flat task memory. The index rebuilds untimed —
      // the apply phases above deleted rows, and a filtered rerun may
      // land on an already-pruned store.
      if (want("band_prune_small") || want("band_prune_bulk")) {
        graft.store.IndexStore.build(store, "band", docsK)
        def keepTable(name: String, df: DataFrame): Unit =
          store.commit(store.stageKeyed(name, df,
            pmod(xxhash64(col("doc_id")),
              lit(graft.store.IndexStore.Buckets.toLong)),
            Seq(col("doc_id"))),
            drops = store.leavesOf(name))
        keepTable("docs_keep1", docsK.filter(col("doc_id") =!= 3L))
        if (want("band_prune_small")) phase("band_prune_small", k, 1) {
          graft.store.IndexStore.prune(store, spark, "band",
            "docs_keep1")
          graft.store.IndexStore.read(store, spark, "band").limit(0)
        }
        keepTable("docs_keep90",
          docsK.filter(pmod(col("doc_id"), lit(10L)) =!= 0L))
        if (want("band_prune_bulk")) phase("band_prune_bulk", k, 1) {
          graft.store.IndexStore.prune(store, spark, "band",
            "docs_keep90")
          graft.store.IndexStore.read(store, spark, "band").limit(0)
        }
      }
      // incremental compact (round 20): the scheduled form. Three
      // points over a fresh band index with 10% replay debris — the
      // FULL compact as the rewrite reference, an incremental compact
      // after ONE appended doc (its Bands rows accrete ≤8 of the 64
      // buckets: output bytes must track that fraction), and the
      // quiet-index no-op (claim: manifest-only, ~zero bytes,
      // sentinel-scale wall). The full compact runs untimed when its
      // phase is filtered out — the incremental point needs the
      // compacted base state either way.
      if (want("band_compact_full") || want("band_compact_inc") ||
          want("band_compact_noop")) {
        graft.store.IndexStore.build(store, "band", docsK)
        graft.store.IndexStore.append(store, "band",
          docsK.filter(pmod(col("doc_id"), lit(10L)) === 0L))
        if (want("band_compact_full")) phase("band_compact_full", k, 1) {
          graft.store.IndexStore.compact(store, spark, "band")
          graft.store.IndexStore.read(store, spark, "band").limit(0)
        } else
          graft.store.IndexStore.compact(store, spark, "band")
        graft.store.IndexStore.append(store, "band",
          docsK.filter(col("doc_id") === 5L))
        if (want("band_compact_inc")) phase("band_compact_inc", k, 1) {
          graft.store.IndexStore.compact(store, spark, "band",
            incremental = true)
          graft.store.IndexStore.read(store, spark, "band").limit(0)
        } else if (want("band_compact_noop"))
          // the noop point must see a QUIET index even on a filtered
          // rerun that skips the inc phase
          graft.store.IndexStore.compact(store, spark, "band",
            incremental = true)
        if (want("band_compact_noop")) phase("band_compact_noop", k, 1) {
          graft.store.IndexStore.compact(store, spark, "band",
            incremental = true)
          graft.store.IndexStore.read(store, spark, "band").limit(0)
        }
      }
      if (want("ivf_build")) phase("ivf_build", k, 1) {
        graft.store.IndexStore.build(store, "ivf", embK)
        graft.store.IndexStore.read(store, spark, "ivf-centroids").limit(0)
      }
      if (want("ivf_search")) phase("ivf_search", k, 2)(
        graft.store.IndexStore.search(store, spark, "ivf", queryBatch))
      // PQ lifecycle: build trains codebooks + encodes at k× (linear
      // claim); search probes a FIXED query batch — the code scan is
      // O(corpus) by design (like sketch) but reads only the codes
      // COLUMN, so the claim is linear bytes at ~1/50 the embedding
      // column's per-row footprint (watch shuffle/scan bytes, not wall)
      if (want("pq_build")) phase("pq_build", k, 1) {
        graft.store.IndexStore.build(store, "pq", embK)
        graft.store.IndexStore.read(store, spark, "pq-codebook").limit(0)
      }
      if (want("pq_search")) phase("pq_search", k, 2)(
        graft.store.IndexStore.search(store, spark, "pq", queryBatch))
      // ivfpq lifecycle: build trains both models + encodes at k×
      // (linear); search probes a FIXED query batch — cell pruning AND
      // codes-column scanning compose, so the probe's bytes are
      // nprobe/k of the corpus at ~1/60 weight
      if (want("ivfpq_build")) phase("ivfpq_build", k, 1) {
        graft.store.IndexStore.build(store, "ivfpq", embK)
        graft.store.IndexStore.read(store, spark, "ivfpq-codebook").limit(0)
      }
      if (want("ivfpq_search")) phase("ivfpq_search", k, 2)(
        graft.store.IndexStore.search(store, spark, "ivfpq", queryBatch))
      // vec (near-identical dedup) lifecycle: build at k× (linear),
      // probe a FIXED batch (claim: FLAT — content-keyed sign buckets
      // manifest-prune every leaf the probe's own buckets don't touch,
      // the band-probe discipline for vectors)
      if (want("vec_build")) phase("vec_build", k, 1) {
        graft.store.IndexStore.build(store, "vec", embK)
        graft.store.IndexStore.read(store, spark, "vec").limit(0)
      }
      if (want("vec_probe")) phase("vec_probe", k, 2)(
        graft.store.IndexStore.search(store, spark, "vec", queryBatch,
          graft.streaming.StreamingVectors.DupCos))
      // at-rest semantic decontamination against the k x pq index
      // (claim: linear in the corpus CODES column — ~1/50 the embedding
      // bytes — with the fixed benchmark side broadcast; unit bytes are
      // fetched for hits only, so wall tracks the codes scan)
      if (want("decontam_semantic")) phase("decontam_semantic", k, 2)(
        graft.store.IndexStore.semanticContamination(store, spark,
          spark.read.parquet(s"$baseDir/embeddings.parquet")
            .filter(col("vec_id") < 10)
            .select(col("vec_id").as("eval_id"), col("embedding"))))

      // perceptual dedup at k x synthetic assets, decoded per partition
      // (claim: one decode+hash scan, linear; shuffles carry 16-byte
      // hash/band rows only — payload bytes never cross an exchange),
      // then the at-rest lifecycle: build at k x, probe a FIXED batch
      // (claim: flat — the probe computes its own band keys and the
      // manifest prunes every untouched bucket)
      val assetN = 1500L * k
      if (want("phash_dedup")) phase("phash_dedup", k, 1)(
        graft.operators.ImageDedupOps.phashNearDupPairs(
          graft.operators.ImageDedupOps.imageHashRows(
            graft.operators.ImageDedupOps.syntheticImageFrame(
              spark, assetN))))
      // epoch-cursor replay skip for a perceptual gate (round 17).
      // Runs BEFORE phash_build: against the still-empty index the
      // untimed first run's 25-image commit is guaranteed (no cross
      // losers; the min-id representative always survives), advancing
      // gate_batch_id_phash to 1. The timed phase then replays epoch 1
      // handing the gate the FULL k× synthetic corpus. Claim: O(1) —
      // the skip fires before the decode pass, so a replayed batch
      // costs one meta read no matter how many payloads it carries;
      // the k× frame is never rendered or decoded.
      if (want("gate_replay")) {
        graft.streaming.StreamingImages.processBatch(store,
          graft.operators.ImageDedupOps.syntheticImageFrame(spark, 25L)
            .withColumn("asset_id", col("asset_id") + 9000000L),
          batchId = Some(1L))
        phase("gate_replay", k, 2) {
          graft.streaming.StreamingImages.processBatch(store,
            graft.operators.ImageDedupOps.syntheticImageFrame(spark,
              assetN),
            batchId = Some(1L))
          spark.range(1).toDF()
        }
      }
      if (want("phash_build")) phase("phash_build", k, 1) {
        graft.store.IndexStore.build(store, "phash",
          graft.operators.ImageDedupOps.syntheticImageFrame(spark, assetN))
        graft.store.IndexStore.read(store, spark, "phash").limit(0)
      }
      if (want("phash_probe")) phase("phash_probe", k, 2)(
        graft.store.IndexStore.search(store, spark, "phash",
          graft.operators.ImageDedupOps.syntheticImageFrame(spark, 25L)))
      // paired-sample (image + caption) dedup at k× (claim: the
      // phash_dedup curve — one decode+hash scan, 16-byte band rows
      // only across exchanges — plus a caption-gram verify join that
      // is proportional to image CANDIDATES, not corpus size; caption
      // text never enters the banded exchange)
      def pairCaption(idCol: Column): Column = format_string(
        "synthetic caption %d with words %d variant %d",
        pmod(idCol, lit(1000L)), pmod(idCol, lit(7L)),
        pmod(idCol, lit(13L)))
      if (want("pair_dedup")) phase("pair_dedup", k, 1)(
        graft.operators.PairedDedupOps.pairedNearDupPairs(
          graft.operators.ImageDedupOps.syntheticImageFrame(spark, assetN)
            .select(col("asset_id").as("pair_id"), col("payload"),
              pairCaption(col("asset_id")).as("caption"))))
      // streaming pair gate probe against k× at-rest state (claim:
      // flat — the phash probe prunes to the batch's band keys and the
      // accepted-caption fetch reads only candidate-id buckets). Needs
      // phash_build in the same run (the probe's index); the accepted
      // table stages untimed, once per store. The 25 probe pairs are
      // the corpus's own first images under shifted ids with IDENTICAL
      // captions, so the conjunctive gate drops all of them — nothing
      // commits and the phase is idempotent across reps and points.
      if (want("pair_probe")) {
        // idempotence precondition, loud: the probe pairs are dropped by
        // the conjunctive gate ONLY because their images match the
        // at-rest phash index — with no index, all 25 would COMMIT into
        // accepted_pairs and the phash index, polluting later reps and
        // points of the sweep
        require(store.leavesOf(
            graft.store.IndexStore.tableOf("phash")).nonEmpty,
          "pair_probe needs phash_build selected in the same run (the " +
            "probe's cross-batch gate is the at-rest phash index)")
        if (store.leavesOf(
            graft.store.IndexStore.AcceptedPairsTable).isEmpty)
          store.commit(store.stageKeyed(
            graft.store.IndexStore.AcceptedPairsTable,
            graft.operators.ImageDedupOps.syntheticImageFrame(spark,
              assetN)
              .select(col("asset_id").as("pair_id"), col("payload"),
                pairCaption(col("asset_id")).as("caption")),
            pmod(xxhash64(col("pair_id")),
              lit(graft.store.IndexStore.Buckets.toLong)),
            Seq(col("pair_id"))))
        phase("pair_probe", k, 2) {
          graft.streaming.StreamingPairs.processBatch(store,
            graft.operators.ImageDedupOps.syntheticImageFrame(spark, 25L)
              .select((col("asset_id") + 9100000L).as("pair_id"),
                col("payload"),
                pairCaption(col("asset_id")).as("caption")))
          spark.range(1).toDF()
        }
      }
      if (want("afp_dedup")) phase("afp_dedup", k, 1)(
        graft.operators.AudioDedupOps.afpNearDupPairs(
          graft.operators.AudioDedupOps.audioHashRows(
            graft.operators.AudioDedupOps.syntheticAudioFrame(
              spark, assetN))))
      if (want("afp_build")) phase("afp_build", k, 1) {
        graft.store.IndexStore.build(store, "afp",
          graft.operators.AudioDedupOps.syntheticAudioFrame(spark, assetN))
        graft.store.IndexStore.read(store, spark, "afp").limit(0)
      }
      if (want("afp_probe")) phase("afp_probe", k, 2)(
        graft.store.IndexStore.search(store, spark, "afp",
          graft.operators.AudioDedupOps.syntheticAudioFrame(spark, 25L)))
      // afp compaction: re-delivered assets collapse and the at-rest
      // truncation policy re-applies globally (claim: LINEAR — one
      // scan of the 24-byte rows through two keyed window exchanges,
      // flat task memory; no re-decode of any payload)
      if (want("afp_compact")) phase("afp_compact", k, 1) {
        graft.store.IndexStore.compact(store, spark, "afp")
        graft.store.IndexStore.read(store, spark, "afp").limit(0)
      }
      // video frame dedup at k x synthetic frames (claim: ONE
      // decode+hash scan — hash rows localCheckpoint like every
      // engine call site, so the self-join never re-renders — linear;
      // every exchange carries 24-byte hash/band rows, frame payloads
      // never cross)
      if (want("video_dedup")) phase("video_dedup", k, 1)(
        graft.operators.VideoDedupOps.videoNearDupPairs(
          graft.operators.VideoDedupOps.videoHashRows(
            graft.operators.VideoDedupOps.syntheticVideoFrame(
              spark, assetN)).localCheckpoint()))
      // at-rest vhash lifecycle: build at k x frames (linear claim),
      // probe a FIXED 24-frame batch (flat claim — same two-level
      // band prune as phash/afp, frame-coverage verdict on top)
      if (want("vhash_build")) phase("vhash_build", k, 1) {
        graft.store.IndexStore.build(store, "vhash",
          graft.operators.VideoDedupOps.syntheticVideoFrame(spark, assetN)
            .withColumnRenamed("video_id", "asset_id"))
        graft.store.IndexStore.read(store, spark, "vhash").limit(0)
      }
      if (want("vhash_probe")) phase("vhash_probe", k, 2)(
        graft.store.IndexStore.search(store, spark, "vhash",
          graft.operators.VideoDedupOps.syntheticVideoFrame(spark, 24L)
            .withColumnRenamed("video_id", "asset_id")))
      // perceptual decontamination at k x corpus vs a FIXED 25-image
      // benchmark (claim: corpus-linear decode+hash scan, benchmark
      // broadcast — shuffle stays at the match-report rows, payloads
      // never cross)
      if (want("decontam_phash")) phase("decontam_phash", k, 1)(
        graft.operators.ImageDedupOps.phashContamination(
          graft.operators.ImageDedupOps.syntheticImageFrame(spark, assetN),
          graft.operators.ImageDedupOps.syntheticImageFrame(spark, 25L)))
      // at-rest exact-span postings: build at k x (linear claim), then
      // certify a FIXED probe batch from rest (claim: flat — the
      // probe's own hashes prune leaves + push key filters, and corpus
      // text is semi-join-fetched for candidate docs only; a wholesale
      // index read here would be the round-10 probe bug reborn)
      if (want("espan_build")) phase("espan_build", k, 1) {
        graft.store.IndexStore.build(store, "espan", docsK)
        graft.store.IndexStore.read(store, spark, "espan").limit(0)
      }
      if (want("espan_probe")) phase("espan_probe", k, 2)(
        graft.store.IndexStore.searchExactSpans(store, spark,
          probeBatch, docsK))
      // espan compaction: (doc_id, pos) postings collapse — no cap
      // policy by design (claim: LINEAR in postings with flat task
      // memory; one keyed dropDuplicates scan, text never re-shingled)
      if (want("espan_compact")) phase("espan_compact", k, 1) {
        graft.store.IndexStore.compact(store, spark, "espan")
        graft.store.IndexStore.read(store, spark, "espan").limit(0)
      }
      // prune against a data table missing 10% of its docs — the
      // post-apply reclaim shape (round 19). Runs LAST among the espan
      // phases: it MUTATES the index. The keep table stages untimed.
      // Claim: LINEAR in postings with flat task memory — one id
      // semi-join (only the narrow id column crosses the exchange on
      // the keep side) + the compact-class rewrite; no text re-read
      if (want("espan_prune")) {
        // a filtered rerun without espan_build would prune an ALREADY
        // pruned store from the previous sweep — a ~0-cost no-op that
        // would land looking like real linear-claim evidence. Rebuild
        // untimed (the lifecycleOnly discipline), and REPLACE any
        // previous docs_prune leaves rather than accreting keep-sets
        if (!want("espan_build"))
          graft.store.IndexStore.build(store, "espan", docsK)
        store.commit(store.stageKeyed("docs_prune",
          docsK.filter(pmod(col("doc_id"), lit(10L)) =!= 0L),
          pmod(xxhash64(col("doc_id")),
            lit(graft.store.IndexStore.Buckets.toLong)),
          Seq(col("doc_id"))),
          drops = store.leavesOf("docs_prune"))
        phase("espan_prune", k, 1) {
          graft.store.IndexStore.prune(store, spark, "espan",
            "docs_prune")
          graft.store.IndexStore.read(store, spark, "espan").limit(0)
        }
      }
      // the DEGRADED prune path (round 20): §23 measured 0 shuffle
      // because the keep-side ids broadcast at every k — force the
      // shuffled semi-join (both broadcast thresholds off) to pin the
      // past-broadcast claim the same way every other scale claim is
      // pinned. Claim: shuffle W linear in ids + postings, flat task
      // memory; results identical by the join's semantics. Rebuilds
      // untimed for the same reasons as espan_prune.
      if (want("espan_prune_shuffled")) {
        graft.store.IndexStore.build(store, "espan", docsK)
        store.commit(store.stageKeyed("docs_prune",
          docsK.filter(pmod(col("doc_id"), lit(10L)) =!= 0L),
          pmod(xxhash64(col("doc_id")),
            lit(graft.store.IndexStore.Buckets.toLong)),
          Seq(col("doc_id"))),
          drops = store.leavesOf("docs_prune"))
        val conf = spark.conf
        val auto = conf.get("spark.sql.autoBroadcastJoinThreshold")
        val adAuto =
          conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        try phase("espan_prune_shuffled", k, 1) {
          graft.store.IndexStore.prune(store, spark, "espan",
            "docs_prune")
          graft.store.IndexStore.read(store, spark, "espan").limit(0)
        } finally {
          conf.set("spark.sql.autoBroadcastJoinThreshold", auto)
          adAuto match {
            case Some(v) => conf
              .set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
            case None => conf
              .unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
          }
        }
      }
    }

    // a phase/point-filtered rerun writes a scratch file — it must never
    // clobber the full sweep's committed evidence with a subset
    val outFile =
      if (onlyPhases.isEmpty && sys.env.get("SPARK_GRAFT_SCALE_POINTS")
          .forall(_ == "1,3,10,30")) "SCALE.json"
      else "SCALE_partial.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      ("[" + out.result().mkString(",\n") + "]")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
