package graft

import java.io.{ByteArrayOutputStream, PrintStream}

import graft.chain.ChainFixture
import graft.etl.{Backfill, FixtureSource}
import graft.store.{GraftStore, IndexStore}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** CLI verify parity: chain-tip lag reporting (verify.rs:35-39) and the
  * real `verify transactions` check (reference stub, verify.rs:92). */
class CliSpec extends AnyFunSuite with BeforeAndAfterAll
    with TempDirCleanup {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  lazy val fx: ChainFixture.Fixture = ChainFixture.build(200)

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  private def newRoot(): String =
    tempDir("graft-store")

  private def captured(body: => Unit): String = {
    val out = new ByteArrayOutputStream()
    Console.withOut(new PrintStream(out)) { body }
    out.toString
  }

  test("index build/append/search: at-rest dedup across CLI invocations") {
    import spark.implicits._
    val root = tempDir("graft-index-cli")
    val storeDir = s"$root/store"
    def doc(id: Long, tag: String) =
      (id, (0 until 60).map(j => s"$tag${id}w$j").mkString(" "))
    def nearCopy(newId: Long, of: (Long, String)) =
      (newId, of._2.split(" ").take(52).mkString(" ") + " " +
        (0 until 8).map(j => s"x${newId}f$j").mkString(" "))
    val a = (0L until 40L).map(doc(_, "a"))
    val b = (100L until 110L).map(doc(_, "b"))
    val aPath = s"$root/a.parquet"
    val bPath = s"$root/b.parquet"
    val probePath = s"$root/probe.parquet"
    a.toDF("doc_id", "text").write.parquet(aPath)
    b.toDF("doc_id", "text").write.parquet(bPath)
    // probe: near-copies of an original-batch doc and an appended doc,
    // plus a novel doc — only the probe file's text is ever shingled
    Seq(nearCopy(900L, a(7)), nearCopy(901L, b(3)), doc(902L, "z"))
      .toDF("doc_id", "text").write.parquet(probePath)

    // three separate CLI invocations = three store instances: the index
    // must survive "process restarts" (all state is the manifest)
    val built = captured {
      cli.Main.run(spark, Array("index", "build", "--store", storeDir,
        "--kind", "band", "--input", aPath))
    }
    assert(built.contains("built fresh 'band' index"))
    val appended = captured {
      cli.Main.run(spark, Array("index", "append", "--store", storeDir,
        "--kind", "band", "--input", bPath))
    }
    assert(appended.contains("appended"))
    val outPath = s"$root/hits.parquet"
    captured {
      cli.Main.run(spark, Array("index", "search", "--store", storeDir,
        "--kind", "band", "--input", probePath, "--output", outPath))
    }
    val hits = spark.read.parquet(outPath)
      .select("new_id", "existing_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.contains((900L, 7L)),
      s"near-copy of original-batch doc not found: $hits")
    assert(hits.contains((901L, 103L)),
      s"near-copy of appended doc not found: $hits")
    assert(!hits.exists(_._1 == 902L), s"novel doc matched: $hits")
    // a fourth invocation compacts (global caps + leaf merge) and the
    // same search still answers from the compacted index; the dry run
    // first sizes it and commits nothing (the search after the REAL
    // compact below still matching proves the sequence moved exactly
    // one compaction's worth)
    val driedC = captured {
      cli.Main.run(spark, Array("index", "compact", "--store", storeDir,
        "--kind", "band", "--dry-run"))
    }
    assert(driedC.contains("DRY RUN compact 'band'") &&
      driedC.contains("nothing committed"), driedC)
    val compacted = captured {
      cli.Main.run(spark, Array("index", "compact", "--store", storeDir,
        "--kind", "band"))
    }
    assert(compacted.contains("compacted 'band' index"))
    // --incremental right after a full compact: every bucket holds
    // one leaf, so the scheduled form is a manifest-only no-op — the
    // message says so and the snapshot does not move
    val gs = new GraftStore(storeDir)
    val quiet = gs.leavesOf(IndexStore.tableOf("band")).map(_.dir)
    val incOut = captured {
      cli.Main.run(spark, Array("index", "compact", "--store", storeDir,
        "--kind", "band", "--incremental"))
    }
    assert(incOut.contains("compacted (incremental) 'band' index") &&
      incOut.contains("rewrote 0 leaves"), incOut)
    assert(gs.leavesOf(IndexStore.tableOf("band")).map(_.dir) == quiet,
      "a quiet incremental compact must not commit")
    // the two flags compose: the scheduled form's sizing pass
    val incDry = captured {
      cli.Main.run(spark, Array("index", "compact", "--store", storeDir,
        "--kind", "band", "--incremental", "--dry-run"))
    }
    assert(incDry.contains("DRY RUN compact (incremental) 'band'") &&
      incDry.contains("nothing committed"), incDry)
    captured {
      cli.Main.run(spark, Array("index", "search", "--store", storeDir,
        "--kind", "band", "--input", probePath, "--output", outPath))
    }
    val hitsAfter = spark.read.parquet(outPath)
      .select("new_id", "existing_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hitsAfter == hits, s"compaction changed results: $hitsAfter")
  }

  test("index search --filter applies an attribute predicate to a " +
      "labeled vec index through the CLI") {
    import spark.implicits._
    val root = tempDir("graft-index-cli-filter")
    val storeDir = s"$root/store"
    val rnd = new scala.util.Random(41)
    val dirv = Seq.fill(12)(rnd.nextGaussian().toFloat)
    // two near-identical copies of one direction, labels 0 and 1, plus
    // unrelated vectors
    val corpus = Seq(
      (1L, dirv.map(_ * 1.001f), 0),
      (2L, dirv.map(_ * 1.002f), 1)) ++
      (10L until 20L).map(i =>
        (i, Seq.fill(12)(rnd.nextGaussian().toFloat), (i % 2).toInt))
    val inputPath = s"$root/vecs.parquet"
    corpus.toDF("vec_id", "embedding", "label").write.parquet(inputPath)
    val probePath = s"$root/probe.parquet"
    Seq((9000L, dirv)).toDF("vec_id", "embedding").write.parquet(probePath)
    captured {
      cli.Main.run(spark, Array("index", "build", "--store", storeDir,
        "--kind", "vec", "--input", inputPath))
    }
    val outPath = s"$root/hits.parquet"
    captured {
      cli.Main.run(spark, Array("index", "search", "--store", storeDir,
        "--kind", "vec", "--input", probePath,
        "--filter", "label = 1", "--output", outPath))
    }
    val ids = spark.read.parquet(outPath)
      .select("existing_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L),
      s"--filter 'label = 1' should match only vec 2, got $ids")
  }

  test("index CLI drives the ANN kinds: pq build/append/search across " +
      "invocations") {
    import spark.implicits._
    val root = tempDir("graft-index-cli-pq")
    val storeDir = s"$root/store"
    val rnd = new scala.util.Random(9)
    val dim = 16
    def vecs(ids: Range): Seq[(Long, Seq[Float])] =
      ids.map(i => (i.toLong, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
    val a = vecs(0 until 300)
    val b = vecs(5000 until 5040)
    val aPath = s"$root/a.parquet"; val bPath = s"$root/b.parquet"
    val probePath = s"$root/q.parquet"
    a.toDF("vec_id", "embedding").write.parquet(aPath)
    b.toDF("vec_id", "embedding").write.parquet(bPath)
    // probe: a scaled copy of an APPENDED vector — exact direction,
    // must come back as the rank-1 neighbor through the at-rest index
    Seq((9000L, b.head._2.map(_ * 1.001f)))
      .toDF("vec_id", "embedding").write.parquet(probePath)
    captured {
      cli.Main.run(spark, Array("index", "build", "--store", storeDir,
        "--kind", "pq", "--input", aPath))
    }
    captured {
      cli.Main.run(spark, Array("index", "append", "--store", storeDir,
        "--kind", "pq", "--input", bPath))
    }
    val outPath = s"$root/hits.parquet"
    captured {
      cli.Main.run(spark, Array("index", "search", "--store", storeDir,
        "--kind", "pq", "--input", probePath, "--output", outPath))
    }
    val top = spark.read.parquet(outPath)
      .filter(org.apache.spark.sql.functions.col("rank") === 1).collect()
    assert(top.length == 1)
    assert(top.head.getAs[Long]("query_id") == 9000L)
    assert(top.head.getAs[Long]("neighbor_id") == 5000L)
    // drift telemetry through the CLI: per-sub rows + the 'all' total
    val report = captured {
      cli.Main.run(spark, Array("index", "report", "--store", storeDir,
        "--kind", "pq"))
    }
    assert(report.contains("scope=all"), report)
    assert(report.linesIterator.count(_.contains("distortion_q=")) ==
      graft.operators.SimilarityOps.PqSubs + 1, report)
  }

  test("index CLI drives the phash kind: build binary images, probe " +
      "a recompressed copy at the kind-aware default threshold") {
    import spark.implicits._
    import graft.operators.ImageDedupOps
    val root = tempDir("graft-index-cli-phash")
    val storeDir = s"$root/store"
    val assets = ImageDedupOps.imageAssets(ImageDedupOps.NumImages)
    val basePath = s"$root/images.parquet"
    assets.filter(_.asset_id < ImageDedupOps.NumImages).toDF()
      .write.parquet(basePath)
    val probePath = s"$root/probe.parquet"
    Seq(ImageDedupOps.ImageAsset(9007L,
      assets.find(_.asset_id == 1007L).get.payload)).toDF()
      .write.parquet(probePath)
    captured {
      cli.Main.run(spark, Array("index", "build", "--store", storeDir,
        "--kind", "phash", "--input", basePath))
    }
    val outPath = s"$root/imghits.parquet"
    captured {
      cli.Main.run(spark, Array("index", "search", "--store", storeDir,
        "--kind", "phash", "--input", probePath, "--output", outPath))
    }
    val hits = spark.read.parquet(outPath).collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("existing_id"),
        r.getAs[Int]("hamming")))
    assert(hits.contains((9007L, 7L, 0)), hits.mkString(","))
  }

  test("index dupes dispatches the perceptual kinds: vhash pairs from " +
      "at-rest fingerprints through the CLI, no re-decode") {
    import spark.implicits._
    import graft.operators.VideoDedupOps
    val root = tempDir("graft-index-cli-vdupes")
    val storeDir = s"$root/store"
    val framesPath = s"$root/frames.parquet"
    VideoDedupOps.videoFrames(VideoDedupOps.NumVideos)
      .map(f => (f.video_id, f.frame_idx, f.payload))
      .toDF("asset_id", "frame_idx", "payload")
      .write.parquet(framesPath)
    captured {
      cli.Main.run(spark, Array("index", "build", "--store", storeDir,
        "--kind", "vhash", "--input", framesPath))
    }
    val outPath = s"$root/vdupes.parquet"
    captured {
      cli.Main.run(spark, Array("index", "dupes", "--store", storeDir,
        "--kind", "vhash", "--output", outPath))
    }
    val pairs = spark.read.parquet(outPath).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    for (v <- 0 until VideoDedupOps.DupSeeds;
         off <- Seq(1000L, 2000L, 3000L))
      assert(pairs.contains((v.toLong, v + off)),
        s"planted pair ($v, ${v + off}) missing from CLI dupes: $pairs")
  }

  test("index dupes --kind pair: SAMPLE-level dups from at-rest rows " +
      "of an IMPORTED (un-gated) corpus — the conjunctive report, " +
      "not the image-only one") {
    import spark.implicits._
    import graft.operators.{ImageDedupOps, PairedDedupOps}
    import graft.store.{GraftStore, IndexStore}
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val root = tempDir("graft-index-cli-pdupes")
    val storeDir = s"$root/store"
    // an external loader's shape: phash index built from the images,
    // captions staged straight into the accepted table — the corpus
    // never passed the gate, so it still CONTAINS its duplicates and
    // the at-rest report is the tool that finds them retroactively
    val imagesPath = s"$root/images.parquet"
    ImageDedupOps.imageAssets(ImageDedupOps.NumImages).toDF()
      .write.parquet(imagesPath)
    captured {
      cli.Main.run(spark, Array("index", "build", "--store", storeDir,
        "--kind", "phash", "--input", imagesPath))
    }
    val store = new GraftStore(storeDir)
    store.commit(store.stageKeyed(IndexStore.AcceptedPairsTable,
      PairedDedupOps.pairedAssets(ImageDedupOps.NumImages)
        .toDF("pair_id", "payload", "caption"),
      pmod(xxhash64(col("pair_id")), lit(IndexStore.Buckets.toLong)),
      Seq(col("pair_id"))))
    val outPath = s"$root/pdupes.parquet"
    captured {
      cli.Main.run(spark, Array("index", "dupes", "--store", storeDir,
        "--kind", "pair", "--output", outPath))
    }
    val pairs = spark.read.parquet(outPath).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // exactly the planted conjunctive triangles; the +2000
    // image-dup-different-caption variants in NO pair
    val want = (0L until ImageDedupOps.DupSeeds.toLong).flatMap(i =>
      Seq((i, i + 1000L), (i, i + 3000L), (i + 1000L, i + 3000L))).toSet
    assert(pairs == want, s"got $pairs")
  }

  test("index dupes --kind pair --apply: the keep-one-witness pass " +
      "deletes non-witness SAMPLES from accepted_pairs and their rows " +
      "from the phash index; the +2000 image-dup-different-caption " +
      "variants survive and the re-run report is empty") {
    import spark.implicits._
    import graft.operators.{ImageDedupOps, PairedDedupOps}
    import graft.store.{GraftStore, IndexStore}
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val root = tempDir("graft-index-cli-papply")
    val storeDir = s"$root/store"
    val imagesPath = s"$root/images.parquet"
    ImageDedupOps.imageAssets(ImageDedupOps.NumImages).toDF()
      .write.parquet(imagesPath)
    captured {
      cli.Main.run(spark, Array("index", "build", "--store", storeDir,
        "--kind", "phash", "--input", imagesPath))
    }
    val store = new GraftStore(storeDir)
    store.commit(store.stageKeyed(IndexStore.AcceptedPairsTable,
      PairedDedupOps.pairedAssets(ImageDedupOps.NumImages)
        .toDF("pair_id", "payload", "caption"),
      pmod(xxhash64(col("pair_id")), lit(IndexStore.Buckets.toLong)),
      Seq(col("pair_id"))))
    // dry-run first: the pair kind's exclusion maps pair_id onto the
    // phash index's asset_id — pass 2 must DRAIN on the simulated
    // survivors (a broken mapping either errors or never converges)
    // and nothing commits
    val before = store.read(spark, IndexStore.AcceptedPairsTable).count()
    val dryOut = captured {
      cli.Main.run(spark, Array("index", "dupes", "--store", storeDir,
        "--kind", "pair", "--apply", "--dry-run"))
    }
    assert(dryOut.contains("DRY RUN 'pair'") &&
      dryOut.contains("nothing committed"), dryOut)
    assert(store.read(spark, IndexStore.AcceptedPairsTable).count()
      == before, "dry run must not delete samples")
    captured {
      cli.Main.run(spark, Array("index", "dupes", "--store", storeDir,
        "--kind", "pair", "--apply"))
    }
    val kept = store.read(spark, IndexStore.AcceptedPairsTable)
      .select("pair_id").collect().map(_.getLong(0)).toSet
    // each conjunctive triangle {i, i+1000, i+3000} keeps witness i;
    // the +2000 variants are NOT sample dups and must all survive
    val lost = (0L until ImageDedupOps.DupSeeds.toLong)
      .flatMap(i => Seq(i + 1000L, i + 3000L)).toSet
    assert((kept & lost).isEmpty, s"losers survived: ${kept & lost}")
    assert((0L until ImageDedupOps.DupSeeds.toLong)
      .forall(i => kept(i) && kept(i + 2000L)),
      s"witnesses or +2000 variants were deleted: $kept")
    assert(IndexStore.read(store, spark, "phash")
      .filter(col("asset_id").isin(lost.toSeq: _*)).count() == 0,
      "loser phash rows must be gone")
    assert(IndexStore.pairDupes(store, spark).isEmpty,
      "re-run report must be empty")
  }

  test("index dupes --apply: non-convergence is a hard error (never a " +
      "success-shaped line over a partial dedup), the --output audit " +
      "trail persists either way, and silently-ignored flags are " +
      "refused in the report branch too") {
    import spark.implicits._
    import graft.operators.DedupOps
    import graft.store.{GraftStore, IndexStore}
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val root = tempDir("graft-index-cli-nonconv")
    val storeDir = s"$root/store"
    val docsPath = s"$root/docs.parquet"
    val corpus = DedupOps.withNearDups(
      (0L until 30L).map(i =>
        (i, (0 until 60).map(j => s"nc${i}w$j").mkString(" ")))
        .toDF("doc_id", "text")).localCheckpoint()
    corpus.write.parquet(docsPath)
    captured {
      cli.Main.run(spark, Array("index", "build", "--store", storeDir,
        "--kind", "band", "--input", docsPath))
    }
    // a SIBLING espan index over the same corpus: the apply below
    // leaves its loser postings inert; `index prune` reclaims them
    captured {
      cli.Main.run(spark, Array("index", "build", "--store", storeDir,
        "--kind", "espan", "--input", docsPath))
    }
    val store = new GraftStore(storeDir)
    store.commit(store.stageKeyed("docs", corpus,
      pmod(xxhash64(col("doc_id")), lit(IndexStore.Buckets.toLong)),
      Seq(col("doc_id"))))
    // --max-passes 1 exits after a PRODUCTIVE pass (the drain pass
    // never runs): hard error naming the condition, not success
    val expected = IndexStore.bandDupes(store, spark).count()
    assert(expected > 0L, "fixture must plant at-rest pairs")
    val auditPath = s"$root/audit.parquet"
    val err = intercept[RuntimeException] {
      captured {
        cli.Main.run(spark, Array("index", "dupes", "--store", storeDir,
          "--kind", "band", "--apply", "--table", "docs",
          "--output", auditPath, "--max-passes", "1"))
      }
    }
    assert(err.getMessage.contains("did NOT converge"), err.getMessage)
    // the audit trail was written BEFORE the error: exactly pass 1's
    // report (== the pre-apply at-rest report), pass-tagged
    val audit = spark.read.parquet(auditPath)
    assert(audit.columns.contains("pass") && audit.count() == expected)
    // pass 1's deletes stuck (each pass commits atomically): every
    // REPORTED pair's copy is gone; a planted copy the banding didn't
    // surface at this salt legitimately survives
    assert(store.read(spark, "docs")
      .filter(col("doc_id") >= 1000000L).count() == 25L - expected)
    // the follow-up apply drains and prints the success line
    val out = captured {
      cli.Main.run(spark, Array("index", "dupes", "--store", storeDir,
        "--kind", "band", "--apply", "--table", "docs"))
    }
    assert(out.contains("applied 'band' dup report"), out)
    // the sibling espan index is now carrying INERT postings for every
    // deleted copy; the prune verb reclaims exactly those rows
    val liveIds = store.read(spark, "docs").select("doc_id")
    def deadPostings() = IndexStore.read(store, spark, "espan")
      .join(liveIds, Seq("doc_id"), "left_anti").count()
    assert(deadPostings() > 0L, "apply must strand sibling postings")
    // size the reclaim first: the dry run reports the exact dead
    // count from the probe alone and commits nothing
    val dead = deadPostings()
    val outDry = captured {
      cli.Main.run(spark, Array("index", "prune", "--store", storeDir,
        "--kind", "espan", "--table", "docs", "--dry-run"))
    }
    assert(outDry.contains(s"would drop $dead dead row(s)") &&
      outDry.contains("nothing committed"), outDry)
    assert(deadPostings() == dead, "dry-run prune must not delete")
    val out2 = captured {
      cli.Main.run(spark, Array("index", "prune", "--store", storeDir,
        "--kind", "espan", "--table", "docs"))
    }
    assert(out2.contains("pruned 'espan' index against 'docs'"), out2)
    assert(deadPostings() == 0L, "prune must reclaim every dead row")
    // prune without --table DEFAULTS to the kind's gate table — the
    // same mapping `index dupes --apply` resolves, so the back-to-back
    // flow needs no re-derivation. espan maps to the curation gate,
    // which this store never staged: the prune refusal fires loudly
    // (an absent keep table is never treated as an empty keep-set —
    // that would be a whole-index delete)
    val gate = graft.streaming.StreamingCuration.AcceptedTable
    val e0 = intercept[RuntimeException] {
      captured {
        cli.Main.run(spark, Array("index", "prune", "--store", storeDir,
          "--kind", "espan"))
      }
    }
    assert(e0.getMessage.contains(gate) &&
      e0.getMessage.contains("EMPTY"), e0.getMessage)
    // once the gate table EXISTS (one doc fewer than the survivors),
    // the defaulted prune resolves to it and reclaims exactly that
    // doc's postings — proving the default is live, not just a new
    // error path
    val gated = store.read(spark, "docs")
      .filter(col("doc_id") =!= 0L)
    store.commit(store.stageKeyed(gate, gated,
      pmod(xxhash64(col("doc_id")), lit(IndexStore.Buckets.toLong)),
      Seq(col("doc_id"))))
    val outDef = captured {
      cli.Main.run(spark, Array("index", "prune", "--store", storeDir,
        "--kind", "espan"))
    }
    assert(outDef.contains(s"against '$gate'"), outDef)
    assert(IndexStore.read(store, spark, "espan")
      .filter(col("doc_id") === 0L).count() == 0L,
      "the defaulted prune must reclaim doc 0's postings")
    // report-branch flag refusals mirror the apply branch: a dial on
    // a Hamming kind, a scope on a scope-less kind, a pass bound on
    // a single-run report — each loud, none silently ignored
    val e1 = intercept[IllegalArgumentException] {
      captured {
        cli.Main.run(spark, Array("index", "dupes", "--store", storeDir,
          "--kind", "phash", "--threshold", "0.5"))
      }
    }
    assert(e1.getMessage.contains("--threshold"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      captured {
        cli.Main.run(spark, Array("index", "dupes", "--store", storeDir,
          "--kind", "band", "--scope", "lang"))
      }
    }
    assert(e2.getMessage.contains("--scope"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      captured {
        cli.Main.run(spark, Array("index", "dupes", "--store", storeDir,
          "--kind", "band", "--max-passes", "2"))
      }
    }
    assert(e3.getMessage.contains("--max-passes"), e3.getMessage)
    // --incremental is compact's scheduled form — any other index
    // verb refuses it instead of silently ignoring it
    val eInc = intercept[IllegalArgumentException] {
      captured {
        cli.Main.run(spark, Array("index", "prune", "--store", storeDir,
          "--kind", "espan", "--incremental"))
      }
    }
    assert(eInc.getMessage.contains("--incremental"), eInc.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      captured {
        cli.Main.run(spark, Array("index", "dupes", "--store", storeDir,
          "--kind", "band", "--table", "docs"))
      }
    }
    assert(e4.getMessage.contains("--table"), e4.getMessage)
  }

  test("index dupes --apply --dry-run: per-pass pair/loser counts size " +
      "the destructive pass, the audit persists, and NOTHING commits; " +
      "--dry-run without --apply is refused") {
    import spark.implicits._
    import graft.operators.DedupOps
    import graft.store.{GraftStore, IndexStore}
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val root = tempDir("graft-index-cli-dryrun")
    val storeDir = s"$root/store"
    val docsPath = s"$root/docs.parquet"
    val corpus = DedupOps.withNearDups(
      (0L until 30L).map(i =>
        (i, (0 until 60).map(j => s"dr${i}w$j").mkString(" ")))
        .toDF("doc_id", "text")).localCheckpoint()
    corpus.write.parquet(docsPath)
    captured {
      cli.Main.run(spark, Array("index", "build", "--store", storeDir,
        "--kind", "band", "--input", docsPath))
    }
    val store = new GraftStore(storeDir)
    store.commit(store.stageKeyed("docs", corpus,
      pmod(xxhash64(col("doc_id")), lit(IndexStore.Buckets.toLong)),
      Seq(col("doc_id"))))
    val expected = IndexStore.bandDupes(store, spark).count()
    assert(expected > 0L, "fixture must plant at-rest pairs")
    val docsBefore = store.read(spark, "docs").count()
    val auditPath = s"$root/dryaudit.parquet"
    val out = captured {
      cli.Main.run(spark, Array("index", "dupes", "--store", storeDir,
        "--kind", "band", "--apply", "--dry-run", "--table", "docs",
        "--output", auditPath))
    }
    // the sizing the report alone can't give: per-pass counts plus the
    // would-delete summary, explicit that nothing was committed
    assert(out.contains(s"pass 1: $expected pair(s)"), out)
    assert(out.contains("DRY RUN 'band' on 'docs'") &&
      out.contains("nothing committed"), out)
    // the simulated audit persisted, pass-tagged like a real apply's
    val audit = spark.read.parquet(auditPath)
    assert(audit.columns.contains("pass") && audit.count() == expected)
    // NOTHING moved: same rows, same at-rest report
    assert(store.read(spark, "docs").count() == docsBefore)
    assert(IndexStore.bandDupes(store, spark).count() == expected)
    // a bounded simulation that exits still-productive is a LOUD
    // PREDICTION, not an error: nothing was committed, so the dry run
    // succeeded at its sizing job — unlike the real apply, where the
    // same exit is a hard error over a partially-deduped store
    val out1 = captured {
      cli.Main.run(spark, Array("index", "dupes", "--store", storeDir,
        "--kind", "band", "--apply", "--dry-run", "--table", "docs",
        "--max-passes", "1"))
    }
    assert(out1.contains("fixpoint NOT reached") &&
      out1.contains("nothing committed"), out1)
    assert(store.read(spark, "docs").count() == docsBefore)
    // the real apply then deletes what the dry run predicted
    val out2 = captured {
      cli.Main.run(spark, Array("index", "dupes", "--store", storeDir,
        "--kind", "band", "--apply", "--table", "docs"))
    }
    assert(out2.contains("applied 'band' dup report"), out2)
    assert(store.read(spark, "docs").count() == docsBefore - expected)
    // a report is already non-destructive: --dry-run needs --apply
    val e = intercept[IllegalArgumentException] {
      captured {
        cli.Main.run(spark, Array("index", "dupes", "--store", storeDir,
          "--kind", "band", "--dry-run"))
      }
    }
    assert(e.getMessage.contains("--dry-run"), e.getMessage)
  }

  test("index dupes --kind band: text near-dup pairs from at-rest " +
      "signatures through the CLI — no corpus text re-read") {
    import spark.implicits._
    import graft.operators.DedupOps
    val root = tempDir("graft-index-cli-bdupes")
    val storeDir = s"$root/store"
    val docsPath = s"$root/docs.parquet"
    DedupOps.withNearDups(
      (0L until 30L).map(i =>
        (i, (0 until 60).map(j => s"cb${i}w$j").mkString(" ")))
        .toDF("doc_id", "text"))
      .write.parquet(docsPath)
    captured {
      cli.Main.run(spark, Array("index", "build", "--store", storeDir,
        "--kind", "band", "--input", docsPath))
    }
    val outPath = s"$root/bdupes.parquet"
    captured {
      cli.Main.run(spark, Array("index", "dupes", "--store", storeDir,
        "--kind", "band", "--output", outPath))
    }
    val pairs = spark.read.parquet(outPath).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    for (i <- 0L until 25L)
      assert(pairs.contains((i, i + 1000000L)),
        s"planted near-copy pair ($i, ${i + 1000000L}) missing: $pairs")
  }

  test("index decontaminate certifies benchmark contamination against " +
      "the at-rest pq index through the CLI") {
    import spark.implicits._
    val root = tempDir("graft-index-cli-decontam")
    val storeDir = s"$root/store"
    val rnd = new scala.util.Random(17)
    val corpus = (0 until 60).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat)))
    val corpusPath = s"$root/corpus.parquet"
    corpus.toDF("vec_id", "embedding").write.parquet(corpusPath)
    val benchPath = s"$root/bench.parquet"
    Seq((500L, corpus(7)._2.map(_ * 1.0005f)),
      (501L, Seq.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("eval_id", "embedding").write.parquet(benchPath)
    captured {
      cli.Main.run(spark, Array("index", "build", "--store", storeDir,
        "--kind", "pq", "--input", corpusPath))
    }
    val outPath = s"$root/contam.parquet"
    captured {
      cli.Main.run(spark, Array("index", "decontaminate",
        "--store", storeDir, "--kind", "pq", "--input", benchPath,
        "--output", outPath))
    }
    val pairs = spark.read.parquet(outPath).collect()
      .map(r => (r.getAs[Long]("eval_id"), r.getAs[Long]("corpus_id")))
    assert(pairs.contains((500L, 7L)), pairs.mkString(","))
    assert(!pairs.exists(_._1 == 501L), pairs.mkString(","))
  }

  test("curate --pii-scrub and --decontaminate-against filter content") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = tempPath("graft-curate-flags")
    val corpusPath = s"$root/corpus.parquet"
    val evalPath = s"$root/eval.parquet"
    val out = s"$root/shards"
    // eval set: 3 docs of 8 distinct tokens each
    val evalDocs = (0 until 3).map(i =>
      (100L + i, (0 until 8).map(j => s"eval${i}tok$j").mkString(" ")))
    // corpus: 40 clean docs, 2 with an email, 3 verbatim eval copies
    val clean = (0 until 40).map(i =>
      (i.toLong, (0 until 10).map(j => s"doc${i}word$j").mkString(" ")))
    val pii = Seq(
      (50L, "contact alice@example.com for the full data card today"),
      (51L, "or write bob@example.com about the remaining license terms"))
    val contaminated = evalDocs.map { case (id, t) => (id + 900, t) }
    (clean ++ pii ++ contaminated).toDF("doc_id", "text")
      .write.parquet(corpusPath)
    evalDocs.toDF("doc_id", "text").write.parquet(evalPath)
    val printed = captured {
      cli.Main.run(spark, Array("curate",
        "--input", corpusPath, "--output", out,
        "--quality-floor-bp", "0", "--near-dup-threshold", "0.95",
        "--docs-per-shard", "10",
        "--pii-scrub",
        "--decontaminate-against", evalPath,
        "--max-contamination-bp", "5000"))
    }
    assert(printed.contains("[curate] kept"))
    val back = spark.read.parquet(out)
    val ids = back.select("doc_id").collect().map(_.getLong(0)).toSet
    // eval copies are gone, clean docs survive
    assert(contaminated.forall { case (id, _) => !ids.contains(id) })
    assert(clean.forall { case (id, _) => ids.contains(id) })
    // emails scrubbed in the written payload
    assert(back.filter(col("text").contains("@example.com")).count() == 0)
    assert(back.filter(col("text").contains("<EMAIL>")).count() == 2)
  }

  test("assets dedup keeps one witness per perceptual cluster and " +
      "writes reports on request") {
    import spark.implicits._
    import graft.operators.ImageDedupOps
    val root = tempPath("graft-assets")
    val in = s"$root/assets.parquet"
    val out = s"$root/deduped"
    ImageDedupOps.imageAssets(ImageDedupOps.NumImages).toDF()
      .write.parquet(in)
    val printed = captured {
      cli.Main.run(spark, Array("assets", "dedup",
        "--kind", "phash", "--input", in, "--output", out))
    }
    assert(printed.contains("survivor row(s)"), printed)
    val ids = spark.read.parquet(out)
      .select("asset_id").collect().map(_.getLong(0)).toSet
    // every planted variant drops; its base (the min of the cluster)
    // survives, as does every unclustered base
    assert(ids == (0 until ImageDedupOps.NumImages).map(_.toLong).toSet,
      s"got $ids")
    // cluster report: every planted quadruple labeled by its base
    val cOut = s"$root/clusters"
    cli.Main.run(spark, Array("assets", "dedup",
      "--kind", "phash", "--input", in, "--output", cOut,
      "--report", "clusters"))
    val comps = spark.read.parquet(cOut).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("comp")).toMap
    for (i <- 0 until ImageDedupOps.DupSeeds)
      assert(comps(i + 3000L) == i.toLong, s"${comps.get(i + 3000L)}")
  }

  test("assets dedup --kind pair dedups at SAMPLE granularity: the " +
      "image-dup-different-caption variant survives, the verbatim and " +
      "near-caption variants drop") {
    import spark.implicits._
    import graft.operators.{ImageDedupOps, PairedDedupOps}
    val root = tempPath("graft-assets-pair")
    val in = s"$root/pairs.parquet"
    val out = s"$root/deduped"
    PairedDedupOps.pairedAssets(ImageDedupOps.NumImages)
      .toDF("pair_id", "payload", "caption").write.parquet(in)
    val printed = captured {
      cli.Main.run(spark, Array("assets", "dedup",
        "--kind", "pair", "--input", in, "--output", out))
    }
    assert(printed.contains("survivor row(s)"), printed)
    val ids = spark.read.parquet(out)
      .select("pair_id").collect().map(_.getLong(0)).toSet
    // bases survive; +1000 (verbatim caption) and +3000 (one-word
    // edit) drop; +2000 (disjoint caption) SURVIVES — an image dup
    // under a different caption is a different training sample
    val want = (0 until ImageDedupOps.NumImages).map(_.toLong).toSet ++
      (0 until ImageDedupOps.DupSeeds).map(i => 2000L + i).toSet
    assert(ids == want, s"got $ids")
  }

  test("assets dedup --kind video keeps one witness per video cluster " +
      "(survivors are all frames of surviving videos)") {
    import spark.implicits._
    import graft.operators.VideoDedupOps
    val root = tempPath("graft-assets-video")
    val in = s"$root/frames.parquet"
    val out = s"$root/deduped"
    VideoDedupOps.videoFrames(VideoDedupOps.NumVideos).toDF()
      .write.parquet(in)
    val printed = captured {
      cli.Main.run(spark, Array("assets", "dedup",
        "--kind", "video", "--input", in, "--output", out))
    }
    assert(printed.contains("survivor row(s)"), printed)
    val ids = spark.read.parquet(out)
      .select("video_id").distinct().collect().map(_.getLong(0)).toSet
    assert(ids == (0 until VideoDedupOps.NumVideos).map(_.toLong).toSet,
      s"got $ids")
  }

  test("a frames table hand-written to the README ingest contract " +
      "(dense 0-based frame_idx, one PNG still per row, a corrupt " +
      "frame allowed) drives assets dedup AND assets rejects: the " +
      "trimmed re-cut collapses, the corrupt frame is audited not " +
      "fatal") {
    import spark.implicits._
    import graft.operators.{ImageDedupOps, VideoDedupOps}
    val root = tempPath("graft-assets-contract")
    val in = s"$root/frames.parquet"
    // what a raw-video user would produce per the README contract:
    // sample deterministically, number stills densely per video
    def still(seed: Long) = ImageDedupOps.encodePng(
      ImageDedupOps.renderSmooth(seed, 112, 96, 0))
    val original = (0 until 6).map(f => (800L, f, still(81000L + f)))
    // a trimmed re-cut: the original's stills 1..5 re-sampled under the
    // same policy — frame_idx restarts at 0 (positions carry no
    // alignment semantics)
    val recut = (0 until 5).map(f => (801L, f, still(81001L + f)))
    // an unrelated video with one corrupt still at frame 2
    val other = (0 until 4).map(f => (802L, f,
      if (f == 2) Array.fill[Byte](24)(0x5a) else still(82000L + f)))
    (original ++ recut ++ other)
      .toDF("video_id", "frame_idx", "payload").write.parquet(in)
    val dedupOut = s"$root/survivors"
    cli.Main.run(spark, Array("assets", "dedup",
      "--kind", "video", "--input", in, "--output", dedupOut))
    val ids = spark.read.parquet(dedupOut)
      .select("video_id").distinct().collect().map(_.getLong(0)).toSet
    assert(ids == Set(800L, 802L),
      s"re-cut must collapse to its original, got $ids")
    val rejOut = s"$root/rejects"
    cli.Main.run(spark, Array("assets", "rejects",
      "--kind", "video", "--input", in, "--output", rejOut))
    val rej = spark.read.parquet(rejOut).collect()
      .map(r => (r.getAs[Long]("video_id"), r.getAs[Int]("frame_idx"),
        r.getAs[String]("reason"))).toSeq
    assert(rej == Seq((802L, 2, "corrupt")), s"$rej")
  }

  test("assets rejects writes the (asset_id, reason) drop audit") {
    import spark.implicits._
    import graft.operators.AudioDedupOps
    val root = tempPath("graft-assets-rej")
    val in = s"$root/audio.parquet"
    val out = s"$root/rejects"
    (AudioDedupOps.audioAssets(4).filter(_.asset_id < 4L) :+
      AudioDedupOps.AudioAsset(999L, Array.fill[Byte](64)(0x2a)) :+
      AudioDedupOps.AudioAsset(998L,
        AudioDedupOps.wav16(Array.fill(8)(100), 8000))).toDF()
      .write.parquet(in)
    val printed = captured {
      cli.Main.run(spark, Array("assets", "rejects",
        "--kind", "afp", "--input", in, "--output", out))
    }
    assert(printed.contains("2 reject audit row(s)"), printed)
    val rej = spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("asset_id") -> r.getAs[String]("reason"))
      .toMap
    assert(rej == Map(999L -> "corrupt", 998L -> "too_short"), s"$rej")
  }

  test("curate --exact-spans cuts the duplicated extent out of the " +
      "written shards, keeping the first occurrence") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = tempPath("graft-curate-spans")
    val corpusPath = s"$root/corpus.parquet"
    val out = s"$root/shards"
    val g = operators.DedupOps.ExactSpanGram
    val boiler = (1 to 20).map(i => s"boiler$i").mkString(" ")
    // docs 0/1 share a 20-token boilerplate run at different offsets;
    // 30 clean docs pad the corpus
    val docs = Seq(
      (0L, s"alpha beta $boiler closing words"),
      (1L, s"$boiler entirely different trailing content here")) ++
      (10 until 40).map(i =>
        (i.toLong, (0 until 16).map(j => s"doc${i}word$j").mkString(" ")))
    docs.toDF("doc_id", "text").write.parquet(corpusPath)
    val printed = captured {
      cli.Main.run(spark, Array("curate",
        "--input", corpusPath, "--output", out,
        "--quality-floor-bp", "0", "--near-dup-threshold", "0.95",
        "--docs-per-shard", "50", "--exact-spans"))
    }
    assert(printed.contains("[curate] kept"))
    val back = spark.read.parquet(out)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 0 (first occurrence) keeps the run; doc 1 loses exactly it
    assert(back(0L) == s"alpha beta $boiler closing words",
      s"doc0: ${back(0L)}")
    assert(back(1L) == "entirely different trailing content here",
      s"doc1: ${back(1L)}")
    // clean docs ride through verbatim
    assert(back(15L) == (0 until 16).map(j => s"doc15word$j")
      .mkString(" "))
  }

  test("curate --lm-floor-bp drops gibberish while natural text passes") {
    import spark.implicits._
    val root = tempPath("graft-curate-lm")
    val corpusPath = s"$root/corpus.parquet"
    val out = s"$root/shards"
    // natural corpus: repetitive English dominates the trigram model;
    // per-doc filler tokens keep the docs clear of the near-dup stage
    val natural = (0 until 60).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog and the " +
        "small cat sleeps near the warm fire in the long story " +
        s"chapter$i section$i part$i topic$i item$i note$i page$i line$i"))
    // gibberish: uniform random alphanumerics — no trigram is frequent
    val rnd = new scala.util.Random(3)
    val junk = (200 until 205).map(i =>
      (i.toLong, Seq.fill(120)(
        "abcdefghijklmnopqrstuvwxyz0123456789"(rnd.nextInt(36))).mkString))
    val df = (natural ++ junk).toDF("doc_id", "text")
    df.write.parquet(corpusPath)
    // pick the floor between the two observed score bands so the test
    // pins SEPARATION (gibberish below, natural above), not an absolute
    // calibration of the trigram arithmetic (LmSpec owns that)
    val model = graft.operators.TextOps.trainCharLm(df)
    val scores = df.select(org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.Lm.lm_score_bp(
          graft.operators.TextOps.lmNorm(
            org.apache.spark.sql.functions.col("text")), model).as("bp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naturalMin = natural.map { case (id, _) => scores(id) }.min
    val junkMax = junk.map { case (id, _) => scores(id) }.max
    assert(naturalMin > junkMax, "corpus failed to separate — bad fixture")
    // junkMax + 1, not the midpoint: integer truncation of a 1-bp gap
    // would otherwise let the top junk doc pass a >= floor gate
    val floor = junkMax + 1
    val printed = captured {
      cli.Main.run(spark, Array("curate",
        "--input", corpusPath, "--output", out,
        "--quality-floor-bp", "0", "--near-dup-threshold", "0.99",
        "--docs-per-shard", "50",
        "--lm-floor-bp", floor.toString))
    }
    assert(printed.contains("[curate] kept"))
    val ids = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(junk.forall { case (id, _) => !ids.contains(id) },
      s"gibberish survived the LM gate: ${ids.intersect(junk.map(_._1).toSet)}")
    assert(natural.count { case (id, _) => ids.contains(id) } >= 50,
      "the LM gate dropped most of the natural corpus")

    // --lm-ref: the model trains on the REFERENCE corpus, so the gate
    // measures "looks like the reference", not "looks like the majority
    // of the input" — with a pure-natural ref the same floor still
    // separates (junk scores only fall when its own trigrams leave the
    // model)
    val refPath = s"$root/ref.parquet"
    natural.toDF("doc_id", "text").write.parquet(refPath)
    val out2 = s"$root/shards2"
    captured {
      cli.Main.run(spark, Array("curate",
        "--input", corpusPath, "--output", out2,
        "--quality-floor-bp", "0", "--near-dup-threshold", "0.99",
        "--docs-per-shard", "50",
        "--lm-floor-bp", floor.toString, "--lm-ref", refPath))
    }
    val ids2 = spark.read.parquet(out2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(junk.forall { case (id, _) => !ids2.contains(id) },
      "gibberish survived the reference-trained LM gate")
    assert(natural.count { case (id, _) => ids2.contains(id) } >= 50)
  }

  test("curate --domain-cap and --target-mixture shape the output corpus") {
    import org.apache.spark.sql.functions._
    val out = tempDir("graft-curate-mix")
    val printed = captured {
      cli.Main.run(spark, Array("curate",
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out,
        "--quality-floor-bp", "0", "--docs-per-shard", "25",
        "--domain-cap", "30",
        "--target-mixture", "en:50,fr:50"))
    }
    assert(printed.contains("wrote"))
    val back = spark.read.parquet(out)
    // mixture: only the weighted languages remain, both represented
    val langs = back.select("lang").distinct().collect()
      .map(_.getString(0)).toSet
    assert(langs == Set("en", "fr"), s"langs: $langs")
    // domain cap: at most 30 docs per source
    val perSource = back.groupBy("source").count().collect()
      .map(_.getAs[Long]("count"))
    assert(perSource.nonEmpty && perSource.forall(_ <= 30))
  }

  test("curate --mixture-alpha-bp smooths the language mix and rejects " +
      "combination with an explicit target") {
    import org.apache.spark.sql.functions._
    val out = tempDir("graft-curate-alpha")
    val in = "/root/testdata/sf0.001/documents.parquet"
    val printed = captured {
      cli.Main.run(spark, Array("curate",
        "--input", in, "--output", out,
        "--quality-floor-bp", "0", "--docs-per-shard", "25",
        "--mixture-alpha-bp", "5000"))
    }
    assert(printed.contains("wrote"))
    val back = spark.read.parquet(out)
    // α=0.5 downsamples the head but keeps every language represented
    val inLangs = spark.read.parquet(in).select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    val outLangs = back.select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(outLangs == inLangs, s"lost languages: ${inLangs -- outLangs}")
    intercept[RuntimeException] {
      cli.Main.run(spark, Array("curate",
        "--input", in, "--output", out,
        "--mixture-alpha-bp", "5000", "--target-mixture", "en:50,fr:50"))
    }
  }

  test("curate runs the corpus pipeline end to end and writes shards") {
    import org.apache.spark.sql.functions._
    val out = tempDir("graft-curate")
    val printed = captured {
      cli.Main.run(spark, Array("curate",
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out,
        "--quality-floor-bp", "3000",
        "--docs-per-shard", "25",
        "--stats"))
    }
    assert(printed.contains("[curate] kept"))
    assert(printed.contains("wrote"))
    assert(printed.contains("_stats sidecar"))
    // the sidecar audits what landed: per-shard doc counts match
    val statsBack = spark.read.parquet(s"$out/_stats")
    val fromStats = statsBack.agg(sum("n_docs")).head().getLong(0)
    assert(fromStats == spark.read.parquet(out).count())
    val back = spark.read.parquet(out)
    val n = back.count()
    assert(n > 0)
    // the written corpus respects the floor, carries a valid split and
    // the payload, and is exactly-once per doc
    // null-inclusive predicates: a null quality_bp/split must FAIL these
    // checks, not slip through a null-valued filter
    assert(back.filter(col("quality_bp").isNull ||
      col("quality_bp") < 3000).count() == 0)
    assert(back.filter(col("split").isNull ||
      !col("split").isin("train", "val", "test")).count() == 0)
    assert(back.filter(col("text").isNull).count() == 0)
    assert(back.select("doc_id").distinct().count() == n)
    // shard dirs exist with ≤ 25 docs each
    val shards = back.groupBy("shard").count().collect()
      .map(_.getAs[Long]("count"))
    assert(shards.forall(_ <= 25))
  }

  test("export --block picks the backfill start for an EMPTY store " +
      "(export.rs:15-17, etl.rs:84-89); a populated store resumes") {
    val storeDir = newRoot()
    cli.Main.run(spark, Array("export", "--store", storeDir,
      "--blocks", "60", "--block", "40"))
    val store = new GraftStore(storeDir)
    import org.apache.spark.sql.functions.{max, min}
    val (mn, mx) = {
      val r = store.read(spark, "blocks")
        .agg(min("number"), max("number")).head()
      (r.getLong(0), r.getLong(1))
    }
    assert(mn == 40L && mx == 59L,
      s"expected blocks 40..59 from --block 40, got $mn..$mx")
    // a populated store resumes from ITS tip — --block below it is inert
    cli.Main.run(spark, Array("export", "--store", storeDir,
      "--blocks", "60", "--block", "10"))
    assert(new GraftStore(storeDir).read(spark, "blocks")
      .agg(min("number")).head().getLong(0) == 40L,
      "--block must not re-ingest below an existing store's range")
  }

  test("export --retention-duration drops exactly the expired buckets " +
      "via the CLI (export.rs:30-38, OP-DEL-3)") {
    val storeDir = newRoot()
    // fixture timestamps are 1700000000 + 10*n; 60 blocks span 590s.
    // bucketSize is the store default (GraftStore), so compute the
    // expectation from the actual bucket layout after the sweep.
    val out = captured {
      cli.Main.run(spark, Array("export", "--store", storeDir,
        "--blocks", "60", "--bucket-size", "20",
        "--retention-duration", "300", "--cleanup-interval", "1h"))
    }
    assert(out.contains("retention sweep"), out)
    val store = new GraftStore(storeDir)
    import org.apache.spark.sql.functions.{max, min}
    val kept = store.read(spark, "blocks")
    // cutoff = ts(59) - 300 = 1700000290 → every surviving bucket must
    // contain at least one block with ts >= cutoff, and the blocks below
    // must be gone in whole-bucket units (retention is a floor)
    val mn = kept.agg(min("number")).head().getLong(0)
    // bucket 0 = heights 0..19 (max ts 1700000190 < cutoff 1700000290)
    // is dropped whole; bucket 1 (max ts 1700000390) straddles and stays
    assert(mn == 20L, s"expected whole-bucket drop of 0..19, min now $mn")
    assert(kept.agg(max("number")).head().getLong(0) == 59L)
    assert(kept.count() == 40L)
    // and a second sweep is idempotent
    val out2 = captured {
      cli.Main.run(spark, Array("export", "--store", storeDir,
        "--blocks", "60", "--bucket-size", "20",
        "--retention-duration", "300"))
    }
    assert(new GraftStore(storeDir).read(spark, "blocks")
      .agg(min("number")).head().getLong(0) == mn, out2)
  }

  test("store export-jdbc mirrors the snapshot into a SQL database " +
      "through the CLI (app_storage.rs:20-67 parity)") {
    val storeDir = newRoot()
    cli.Main.run(spark, Array("export", "--store", storeDir,
      "--blocks", "30"))
    val db = tempPath("graft-cli-derby").resolve("db")
    val dsn = s"jdbc:derby:$db;create=true"
    val out = captured {
      cli.Main.run(spark, Array("store", "export-jdbc",
        "--store", storeDir, "--dsn", dsn, "--jdbc-prefix", "cli"))
    }
    assert(out.contains("exported 30 row(s) to cli_blocks"), out)
    val back = spark.read.format("jdbc")
      .option("url", dsn).option("dbtable", "cli_blocks").load()
    assert(back.count() == 30)
    assert(back.columns.contains("number"))
    // verb-local flag: --dsn must NOT pick up a GRAFT_DSN env leak
    val e = intercept[RuntimeException] {
      cli.Main.run(spark, Array("store", "export-jdbc",
        "--store", storeDir), env = Map("GRAFT_DSN" -> dsn))
    }
    assert(e.getMessage.contains("--dsn"), e.getMessage)
  }

  test("env fallback is restricted to the reference's env-backed flags: " +
      "verb-local selectors ignore GRAFT_* (main.rs:27-58 vs view/store)") {
    val storeDir = newRoot()
    cli.Main.run(spark, Array("export", "--store", storeDir,
      "--blocks", "20"))
    // GRAFT_NUMBER must not satisfy `view block` — the verb-local
    // selector is flag-only, so this errors instead of silently
    // resolving height 5
    val e = intercept[RuntimeException] {
      cli.Main.run(spark, Array("view", "block", "--store", storeDir),
        env = Map("GRAFT_NUMBER" -> "5"))
    }
    assert(e.getMessage.contains("--number or --hash"), e.getMessage)
    // GRAFT_FROM must not redirect `store changes` either
    val e2 = intercept[RuntimeException] {
      cli.Main.run(spark, Array("store", "changes", "--store", storeDir),
        env = Map("GRAFT_FROM" -> "v-bogus"))
    }
    assert(e2.getMessage.contains("--from"), e2.getMessage)
    // while a global stays env-backed: GRAFT_STORE alone locates the store
    val out = captured {
      cli.Main.run(spark, Array("view", "block", "--number", "5"),
        env = Map("GRAFT_STORE" -> storeDir))
    }
    assert(out.contains("5"), out)
  }

  test("store snapshots lists versions with the current marked; vacuum " +
      "reclaims history and live reads survive") {
    val root = newRoot()
    captured {
      cli.Main.run(spark, Array("export", "--store", root, "--blocks", "50"))
    }
    captured { // second commit -> second snapshot
      cli.Main.run(spark, Array("export", "--store", root, "--blocks", "100"))
    }
    val listed = captured {
      cli.Main.run(spark, Array("store", "snapshots", "--store", root))
    }.linesIterator.toSeq
    assert(listed.count(_.startsWith("snapshot-")) >= 2)
    assert(listed.last.endsWith("<- current"), s"current unmarked: $listed")
    // two exports left two leaves in the hot buckets — compact merges
    // them, vacuum then reclaims the dropped originals
    val compacted = captured {
      cli.Main.run(spark, Array("store", "compact", "--store", root))
    }
    assert(compacted.contains("[store] compacted"))
    // dry run first: the would-reclaim count is exact (same walk,
    // same locks), nothing is deleted — history snapshots survive
    val dried = captured {
      cli.Main.run(spark, Array("store", "vacuum", "--store", root,
        "--keep", "1", "--grace-ms", "0", "--dry-run"))
    }
    val wouldReclaim = "would reclaim (\\d+) leaf".r
      .findFirstMatchIn(dried).map(_.group(1).toLong)
      .getOrElse(sys.error(s"no dry-run count in: $dried"))
    assert(wouldReclaim > 0L && dried.contains("nothing deleted"), dried)
    val stillThere = captured {
      cli.Main.run(spark, Array("store", "snapshots", "--store", root))
    }.linesIterator.count(_.startsWith("snapshot-"))
    assert(stillThere >= 2, "dry-run vacuum must not drop snapshots")
    val vacuumed = captured {
      cli.Main.run(spark, Array("store", "vacuum", "--store", root,
        "--keep", "1", "--grace-ms", "0"))
    }
    assert(vacuumed.contains(s"vacuum reclaimed $wouldReclaim leaf"),
      s"real reclaim must match the dry prediction: $vacuumed")
    val after = captured {
      cli.Main.run(spark, Array("store", "snapshots", "--store", root))
    }.linesIterator.toSeq
    assert(after.count(_.startsWith("snapshot-")) == 1)
    // the store still reads coherently after reclamation
    val shown = captured {
      cli.Main.run(spark, Array("view", "block", "--store", root,
        "--number", "42"))
    }
    assert(shown.contains("42"))
  }

  test("store changes reports the manifest diff and counts logically-new " +
      "rows between snapshots") {
    val root = newRoot()
    captured {
      cli.Main.run(spark, Array("export", "--store", root, "--blocks", "50"))
    }
    val v1 = new GraftStore(root).currentSnapshot().get
    captured {
      cli.Main.run(spark, Array("export", "--store", root, "--blocks", "100"))
    }
    // manifest-level: the incremental export added leaves to the chain
    // tables (no file is opened for this form)
    val diff = captured {
      cli.Main.run(spark, Array("store", "changes", "--store", root,
        "--from", v1))
    }
    assert(diff.linesIterator.exists(_.startsWith("blocks: +")), diff)
    // row-level: both exports land in height bucket 0, so the logical
    // count only works because the from-snapshot's bucket is subtracted —
    // 50 genuinely new blocks, the first 50 not re-reported
    val rowLevel = captured {
      cli.Main.run(spark, Array("store", "changes", "--store", root,
        "--from", v1, "--table", "blocks", "--keys", "number"))
    }
    assert(rowLevel.contains("50 new row(s) in 'blocks'"), rowLevel)
    // --table alone: per-bucket detail from footer stats, no file opened —
    // the incremental export appended one leaf of the 50 new blocks into
    // height bucket 0, and its height span comes straight from the
    // manifest's footer stats
    val perBucket = captured {
      cli.Main.run(spark, Array("store", "changes", "--store", root,
        "--from", v1, "--table", "blocks"))
    }
    val line = perBucket.linesIterator
      .find(_.startsWith("blocks bucket 0:"))
    assert(line.isDefined, perBucket)
    assert(line.get.contains("+1 leaf dir(s) +50 rows h[50..99]"), perBucket)
    assert(line.get.contains("-0 leaf dir(s)"), perBucket)
    // --keys without --table is still a loud error, not a silent guess
    val err = intercept[RuntimeException] {
      cli.Main.run(spark, Array("store", "changes", "--store", root,
        "--from", v1, "--keys", "number"))
    }
    assert(err.getMessage.contains("--keys needs --table"))
    // so is a typo'd table name — never a silent empty increment
    val typo = intercept[RuntimeException] {
      cli.Main.run(spark, Array("store", "changes", "--store", root,
        "--from", v1, "--table", "blokcs"))
    }
    assert(typo.getMessage.contains("unknown table 'blokcs'"), typo.getMessage)
    assert(typo.getMessage.contains("blocks"), typo.getMessage)
  }

  test("store changes --table error lists LOGICAL names under a " +
      "tables prefix") {
    val root = newRoot()
    captured {
      cli.Main.run(spark, Array("export", "--store", root,
        "--tables-prefix", "ctn", "--blocks", "20"))
    }
    val v1 = new GraftStore(root, tablesPrefix = "ctn")
      .currentSnapshot().get
    // candidates must be retypeable as --table values: 'blocks', not
    // the physical 'ctn_blocks' (which would fail again if retyped)
    val typo = intercept[RuntimeException] {
      cli.Main.run(spark, Array("store", "changes", "--store", root,
        "--tables-prefix", "ctn", "--from", v1, "--table", "blokcs"))
    }
    assert(typo.getMessage.contains("unknown table 'blokcs'"), typo.getMessage)
    assert(typo.getMessage.contains("blocks"), typo.getMessage)
    assert(!typo.getMessage.contains("ctn_blocks"), typo.getMessage)
    // and the real logical name validates
    val ok = captured {
      cli.Main.run(spark, Array("store", "changes", "--store", root,
        "--tables-prefix", "ctn", "--from", v1, "--table", "blocks"))
    }
    assert(ok.contains("no changes in 'blocks'"), ok)
  }

  test("verify blocks reports the store's lag behind the chain tip") {
    val root = newRoot()
    // store stops at 196 while the fixture chain tip is 199 → lag 3
    Backfill.run(spark, new FixtureSource(fx), new GraftStore(root), 0, 196)
    val out = captured {
      cli.Main.run(spark, Array("verify", "blocks", "--store", root))
    }
    assert(out.contains("blocks OK"))
    assert(out.contains("stored max 196"))
    assert(out.contains("chain tip 199"))
    assert(out.contains("lag 3"))
  }

  test("verify transactions passes on a full ingest, fails on a filtered one") {
    val full = newRoot()
    Backfill.run(spark, new FixtureSource(fx), new GraftStore(full), 0, 99)
    val ok = captured {
      cli.Main.run(spark, Array("verify", "transactions", "--store", full))
    }
    assert(ok.contains("transactions OK"))

    val filtered = newRoot()
    // address filter drops txs → stored counts < header transaction_count
    Backfill.run(spark, new FixtureSource(fx), new GraftStore(filtered), 0, 99,
      addressFilter = Seq("cb000000000000000000000000000000000000000000"))
    val e = intercept[RuntimeException] {
      cli.Main.run(spark,
        Array("verify", "transactions", "--store", filtered))
    }
    assert(e.getMessage.contains("stored tx"))
  }
}
