package graft

import graft.operators.{CurationOps, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Behavior checks for the curation operators: transitive closure over
  * multi-hop chains, stratified balance, decontamination invariants,
  * repetition-signal bounds. (Exact values are gated by the DuckDB
  * oracles; these cover properties the oracles can't express.) */
class CurationOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("connectedComponents collapses a multi-hop chain to one label") {
    import spark.implicits._
    // path 1-2-3-4-5 (diameter 4 -> needs several propagation rounds),
    // plus a disjoint pair
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L), (11L, 10L))
      .toDF("id_a", "id_b")
    val labels = CurationOps.connectedComponents(edges).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("comp")).toMap
    assert((1L to 5L).forall(labels(_) == 1L))
    assert(labels(10L) == 10L && labels(11L) == 10L)
  }

  test("connectedComponents equals union-find on random graphs") {
    import spark.implicits._
    // seeded sweep over shapes the fixed cases don't cover: long
    // chains, stars, cycles, self-loops, duplicate and reversed edges
    val rnd = new scala.util.Random(1337)
    for (trial <- 1 to 6) {
      val nNodes = 20 + rnd.nextInt(60)
      val edges = Seq.fill(10 + rnd.nextInt(80)) {
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong)
      }
      // driver-side union-find reference
      val parent = collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(n => n -> find(n)).toMap
      // find() compresses to the min root because unions always point
      // max → min, so `want` is directly comparable to comp = min id
      val got = CurationOps
        .connectedComponents(edges.toDF("id_a", "id_b").repartition(5))
        .collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("comp")).toMap
      assert(got == want, s"trial $trial: $nNodes nodes diverged")
    }
  }

  test("stratified sample balances languages to ~the smallest stratum") {
    val docs = Tables.t(spark, dir, "documents")
    val mn = docs.groupBy("lang").count()
      .agg(min("count")).head().getLong(0)
    val sampled = CurationOps.sampleStratified.fn(spark, dir)
      .groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    // every language survives, and no stratum strays far from the target
    // (hash-bucket granularity wobbles at small counts)
    assert(sampled.keySet ==
      docs.select("lang").distinct().collect().map(_.getString(0)).toSet)
    sampled.values.foreach { c =>
      assert(c >= mn / 2 && c <= mn * 3 / 2 + 1, s"stratum count $c vs min $mn")
    }
  }

  test("decontamination covers exactly the >=5-token test-split docs") {
    val out = CurationOps.decontaminate.fn(spark, dir).collect()
    val bps = out.map(_.getAs[Long]("matched_bp"))
    assert(bps.forall(bp => bp >= 0 && bp <= 10000))
    // independently recompute the expected test-doc population from the
    // shipped split query (same salt -> same buckets)
    val testIds = CurationOps.sampleSplit.fn(spark, dir)
      .filter(col("split") === "test").select("doc_id")
    val expected = Tables.t(spark, dir, "documents")
      .join(testIds, "doc_id")
      .filter(size(split(lower(col("text")), "\\s+")) >= 5)
      .count()
    assert(out.length.toLong == expected)
  }

  test("curation pipeline: copies collapse, survivors are dup-free, floor holds") {
    val docs = Tables.t(spark, dir, "documents")
    val corpus = operators.DedupOps.withNearDups(docs).localCheckpoint()
    val out = CurationOps.curateCorpus(corpus).localCheckpoint()
    val ids = out.collect().map(_.getAs[Long]("doc_id")).toSet

    // every injected near-copy whose source survived is gone (keeper is
    // the min id = the original)
    val survivingCopies = ids.filter(_ >= 1000000L)
    assert(survivingCopies.forall(c => !ids.contains(c - 1000000L)),
      s"copy kept alongside its source: ${survivingCopies.take(5)}")
    // re-running the detector over the survivors finds nothing: the
    // detector is deterministic and its candidate set over a subset is a
    // subset, so dropping one endpoint of every detected pair empties it
    val residual = operators.DedupOps.minhashNearDupPairs(
      corpus.join(out.select("doc_id"), "doc_id"), 0.4)
    assert(residual.isEmpty, "near-dup pair survived curation")
    // floor + split invariants
    out.collect().foreach { r =>
      assert(r.getAs[Long]("quality_bp") >= 3000L)
      assert(Set("train", "val", "test")(r.getAs[String]("split")))
    }
    assert(ids.nonEmpty && ids.size < corpus.count())
  }

  test("mixture sample keeps the binding language whole, others at rate") {
    import spark.implicits._
    // en supply is binding for weights en 40 / fr 20:
    // T = min(100*60/40, 300*60/20) = 150; en keeps 150*40/60 = 100
    // (everything), fr keeps 150*20/60 = 50 of 300 (rate 1666 bp)
    val corpus = ((0L until 100L).map(i => (i, "en")) ++
      (100L until 400L).map(i => (i, "fr"))).toDF("doc_id", "lang")
    val out = CurationOps.mixtureSample(corpus, Seq("en" -> 40L, "fr" -> 20L))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang")))
    val byLang = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang("en") == 100, s"binding lang must keep all docs: $byLang")
    // hash sampling hits the 50-doc target up to binomial noise
    assert(byLang("fr") >= 30 && byLang("fr") <= 70, s"fr count: $byLang")
    // deterministic: the same corpus resamples to the identical set
    val again = CurationOps
      .mixtureSample(corpus, Seq("en" -> 40L, "fr" -> 20L))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang")))
    assert(out.toSet == again.toSet)
  }

  test("alpha mixture: α=1 keeps the natural mix, α=0 balances to the " +
      "smallest, the tail's share grows monotonically as α falls") {
    import spark.implicits._
    // heavy head, thin tail: en 1000, fr 200, zh 40
    val corpus = ((0L until 1000L).map(i => (i, "en")) ++
      (1000L until 1200L).map(i => (i, "fr")) ++
      (1200L until 1240L).map(i => (i, "zh"))).toDF("doc_id", "lang")
    def byLang(alphaBp: Long): Map[String, Int] =
      CurationOps.mixtureAlpha(corpus, alphaBp)
        .collect().map(_.getAs[String]("lang"))
        .groupBy(identity).view.mapValues(_.length).toMap
    // α=1: weights ∝ counts — everything survives modulo integer
    // rounding of the rate arithmetic
    val natural = byLang(10000L)
    assert(natural("en") >= 950 && natural("fr") >= 190 &&
      natural("zh") >= 38, s"natural mix lost docs: $natural")
    // α=0: uniform weights — every language lands near the smallest's
    // size (the stratified balance-to-min regime, binomial noise aside)
    val balanced = byLang(0L)
    assert(balanced.values.forall(n => n >= 25 && n <= 55),
      s"balanced mix should pin all langs near 40: $balanced")
    // monotone: the tail's SHARE never shrinks as α falls
    val shares = Seq(10000L, 5000L, 0L).map { a =>
      val m = byLang(a); m("zh").toDouble / m.values.sum
    }
    assert(shares == shares.sorted,
      s"zh share must grow as alpha falls: $shares")
    // determinism: hash membership — identical set on a re-run
    assert(CurationOps.mixtureAlpha(corpus, 5000L).collect().map(
        _.getAs[Long]("doc_id")).toSet ==
      CurationOps.mixtureAlpha(corpus, 5000L).collect().map(
        _.getAs[Long]("doc_id")).toSet)
    // out-of-range α rejected up front
    intercept[IllegalArgumentException] {
      CurationOps.mixtureAlpha(corpus, 10001L)
    }
  }

  test("pow(n, 0.5) == sqrt(n): the identity the α=0.5 oracle rides on") {
    // the sample_mixture_alpha oracle recomputes the driver-side weight
    // round(pow(n, 0.5)*1000) as round(sqrt(n)*1000) in DuckDB; sqrt is
    // correctly rounded by IEEE in both engines, so the oracle is exact
    // IFF this JVM's pow(x, 0.5) equals its sqrt — pin that over a wide
    // integer sweep (dense low range + strided high range)
    (1L to 100000L).foreach(n =>
      assert(math.pow(n.toDouble, 0.5) == math.sqrt(n.toDouble), s"n=$n"))
    (100001L to 4000000000L by 9999991L).foreach(n =>
      assert(math.pow(n.toDouble, 0.5) == math.sqrt(n.toDouble), s"n=$n"))
  }

  test("mixture sample rejects bad weights and missing languages loudly") {
    import spark.implicits._
    val corpus = ((0L until 10L).map(i => (i, "en")) ++
      (10L until 20L).map(i => (i, "fr"))).toDF("doc_id", "lang")
    // zero / negative weights: rejected before any job runs
    intercept[IllegalArgumentException] {
      CurationOps.mixtureSample(corpus, Seq("en" -> 0L, "fr" -> 100L))
    }
    intercept[IllegalArgumentException] {
      CurationOps.mixtureSample(corpus, Seq.empty)
    }
    // a repeated language would double-emit every kept doc of that lang
    // through the membership join — rejected up front
    val dupErr = intercept[IllegalArgumentException] {
      CurationOps.mixtureSample(corpus, Seq("en" -> 50L, "en" -> 50L))
    }
    assert(dupErr.getMessage.contains("duplicate language"))
    // a weighted language absent from the corpus: raises at run time
    // instead of silently mis-targeting the remaining strata
    val err = intercept[Exception] {
      CurationOps.mixtureSample(corpus,
        Seq("en" -> 50L, "zz" -> 50L)).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.toString + messages(t.getCause)
    assert(messages(err).contains("missing from corpus"))
  }

  test("mixture never floors a weighted tail language out, and null " +
      "lang rows are excluded rather than crashing the alpha mixture") {
    import spark.implicits._
    // the flooring counter-example: en 10, zh 1 at α=0.5 used to yield
    // rate_bp(zh)=0 — zh vanished despite the tail-upweighting promise.
    // The demand clamp + ceiling now keep its one doc deterministically.
    val tiny = ((0L until 10L).map(i => (i, "en")) :+ (10L, "zh"))
      .toDF("doc_id", "lang")
    val langs = CurationOps.mixtureAlpha(tiny, 5000L)
      .collect().map(_.getAs[String]("lang")).toSet
    assert(langs.contains("zh"), s"tail language floored out: $langs")
    // null lang: a web-crawl reality. The null count-group used to leak
    // into the derived weights and fire raise_error at run time; now
    // null-lang docs are excluded from the mixture, nothing crashes.
    val withNulls = (0L until 50L)
      .map(i => (i, if (i % 5 == 0) null else if (i < 30) "en" else "fr"))
      .toDF("doc_id", "lang")
    val out = CurationOps.mixtureAlpha(withNulls, 5000L).collect()
    assert(out.forall(_.getAs[String]("lang") != null))
    assert(out.nonEmpty)
  }

  test("mixture rate arithmetic is exact at pretraining-corpus scale " +
      "(the regime where in-SQL Long products wrapped)") {
    // 3e8 docs with alpha-style 1000×-scaled weights: the former SQL
    // plan computed cnt*total ≈ 1000·N² ≈ 9e22 >> Long.MaxValue and
    // wrapped silently (ANSI off). The BigInt driver path must agree
    // with an independent floating-point model of the same formula.
    val counts = Map("en" -> 200_000_000L, "zh" -> 90_000_000L,
      "sw" -> 10_000_000L)
    val weights = counts.toSeq.sorted.map { case (l, n) =>
      l -> math.round(math.pow(n.toDouble, 0.5) * 1000.0)
    }
    val rates = CurationOps.mixtureRates(weights, counts).toMap
    assert(rates.values.forall(r => r >= 1L && r <= 10000L),
      s"rates out of range (overflow regression?): $rates")
    val total = weights.map(w => BigDecimal(w._2)).sum
    val t = weights.map { case (l, w) =>
      BigDecimal(counts(l)) * total / BigDecimal(w) }.min
    weights.foreach { case (l, w) =>
      val expect = (t * w / total) * 10000 / counts(l)
      assert((BigDecimal(rates(l)) - expect).abs <= 1,
        s"$l: got ${rates(l)}, float model says $expect")
    }
    // α=0.5 upweights the tail: sw keeps a strictly higher fraction
    assert(rates("sw") > rates("en"))
  }

  test("mixture rates are exactly invariant to weight scaling across a " +
      "randomized sweep (the BigInt-rationality property)") {
    // rate_bp depends only on the weight RATIOS: every step — t's floor,
    // the demand floor, the ceiling — is a rational in which a common
    // weight factor k cancels, so mixtureRates(k·w) == mixtureRates(w)
    // EXACTLY, for any magnitudes. Long-wrapping arithmetic (the bug the
    // BigInt rewrite killed) breaks this at large counts×k; so would any
    // future "optimization" that reorders the integer ops.
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val langs = (0 until (2 + rnd.nextInt(6))).map(i => s"l$i")
      val counts = langs.map(_ -> (1L + rnd.nextLong(1_000_000_000_000L)))
        .toMap
      val weights = langs.map(_ -> (1L + rnd.nextLong(1_000_000L)))
      val k = 1L + rnd.nextLong(1_000L)
      val scaled = weights.map { case (l, w) => l -> w * k }
      assert(CurationOps.mixtureRates(weights, counts) ==
        CurationOps.mixtureRates(scaled, counts),
        s"scale invariance broke at k=$k, counts=$counts, weights=$weights")
    }
  }

  test("domain cap keeps at most N per source, stable under repartitioning") {
    import spark.implicits._
    val d = (0L until 300L).map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source")
    val once = CurationOps.capPerDomain(d, 7).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    assert(once.groupBy(_._2).forall(_._2.length == 7))
    // hash-rank membership is a property of the rows, not the layout
    val again = CurationOps.capPerDomain(d.repartition(13), 7).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    assert(once.toSet == again.toSet)
  }

  test("quality-weighted sample is deterministic, in bounds, non-trivial") {
    val once = CurationOps.qualityWeighted.fn(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("quality_bp")))
    val again = CurationOps.qualityWeighted.fn(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("quality_bp")))
    assert(once.toSet == again.toSet) // layout/rerun-independent
    // a real downsample: some docs kept, some dropped (exact membership
    // is gated by the DuckDB oracle; per-doc keep is an independent
    // hash draw, so a mean-enrichment assert would be fixture luck,
    // not a property of the construction)
    val total = graft.Tables.t(spark, dir, "documents").count()
    assert(once.nonEmpty && once.length < total)
    once.foreach { case (_, bp) => assert(bp > 0L && bp <= 10000L) }
  }

  test("calibration rank arithmetic equals a sequential reference on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    // random (lang, bp) tables with duplicates and tiny strata — the
    // shapes where ceil-rank off-by-ones would hide
    for (trial <- 1 to 4) {
      val rows = Seq("aa", "bb", "cc").flatMap { lang =>
        Seq.fill(1 + rnd.nextInt(40))((lang, rnd.nextInt(10) * 1000L))
      }
      // the PRODUCTION construction, on arbitrary (lang, bp) input
      val got = CurationOps.calibrate(rows.toDF("lang", "bp").repartition(4))
        .collect()
        .map(r => (r.getAs[String]("lang"), r.getAs[Int]("q_bp")) ->
          r.getAs[Long]("value_bp")).toMap
      val want = rows.groupBy(_._1).flatMap { case (lang, g) =>
        val sorted = g.map(_._2).sorted
        CurationOps.CalibrationQs.map(q =>
          (lang, q) -> sorted(math.ceil(sorted.length * q / 10000.0).toInt - 1))
      }
      assert(got == want, s"trial $trial diverged")
    }
  }

  test("quality calibration: exact quantiles track approx_percentile") {
    val exact = CurationOps.qualityCalibration.fn(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Int]("q_bp")) ->
        r.getAs[Long]("value_bp")).toMap
    assert(exact.nonEmpty)
    // quantiles are monotone in q within each language
    exact.keys.map(_._1).toSeq.distinct.foreach { lang =>
      val vs = CurationOps.CalibrationQs.map(q => exact((lang, q)))
      assert(vs == vs.sorted, s"$lang quantiles not monotone: $vs")
    }
    // the at-scale variant (sketch-based, one partial-agg pass) lands
    // within a rank-step of the exact values — the measured evidence
    // for swapping it in at 100 TB
    val pcts = CurationOps.CalibrationQs
      .map(q => (q / 10000.0).toString).mkString(", ")
    val approx = graft.Tables.t(spark, dir, "documents")
      .select(col("lang"),
        expr(graft.operators.TextOps.qualityBpSparkSql).as("bp"))
      .groupBy(col("lang"))
      .agg(expr(s"approx_percentile(bp, array($pcts), 10000)").as("ap"))
      .collect()
      .map(r => r.getAs[String]("lang") -> r.getSeq[Long](1)).toMap
    approx.foreach { case (lang, vs) =>
      assert(vs.length == CurationOps.CalibrationQs.length)
      CurationOps.CalibrationQs.zip(vs).foreach { case (q, v) =>
        assert(math.abs(v - exact((lang, q))) <= 1500,
          s"$lang q=$q approx $v vs exact ${exact((lang, q))}")
      }
    }
  }

  test("repetition signals stay in basis-point bounds") {
    val rows = TextOps.repetition.fn(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val top = r.getAs[Long]("top2_bp")
      val dup = r.getAs[Long]("dup2_bp")
      assert(top >= 1 && top <= 10000) // most frequent gram occurs >= once
      assert(dup >= 0 && dup <= 10000)
      // if anything repeats, the top gram is part of the repeated mass
      if (dup > 0) assert(dup >= top)
    }
  }
}
