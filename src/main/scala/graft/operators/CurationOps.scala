package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines (SURVEY §7.6
  * extension): the steps between "near-dup pairs exist" and "a curated
  * training set ships".
  *
  *  - [[connectedComponents]] / dedup_clusters: pair lists are not
  *    actionable — keep-one-per-cluster needs the transitive closure.
  *    Iterative neighbor-min label propagation; every round is one
  *    shuffle join + partial-aggregated min, O(cluster diameter) rounds.
  *  - sample_split: deterministic hash-mod train/val/test assignment —
  *    the split survives reruns, re-partitioning and incremental ingest
  *    (a random() split does not). Pure column expressions at scan speed.
  *  - sample_stratified: per-stratum deterministic down-sampling to a
  *    balanced corpus (every language at the smallest language's size).
  *  - text_decontaminate: n-gram-overlap contamination of the TEST split
  *    against the TRAIN split — the check run before an eval set is
  *    trusted; train side collapses to distinct grams, never doc-pairs.
  *  - curation_topk: best-k documents per language by quality score —
  *    the per-group selection step of quality filtering.
  *  - text_doc_freq: document frequency of tokens (vocabulary building
  *    with a min-df floor). explode + count benefits from map-side
  *    partial aggregation, so stopword skew never concentrates raw rows.
  */
object CurationOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "embeddings")

  // ---------------------------------------------------------------------
  // Connected components (duplicate-cluster resolution)
  // ---------------------------------------------------------------------

  /** Transitive closure of an undirected edge list (`id_a`, `id_b`) into
    * (node, component) where component = min node id reachable.
    *
    * Neighbor-min propagation: comp(v) <- min(comp(v), min over
    * neighbors' comp). Converges in O(diameter) rounds — near-dup
    * clusters are shallow (a dup of a dup of X is still ~X), so the loop
    * is short in practice; `maxIter` bounds pathological chains.
    * Each round is ONE shuffle (join on dst + min-agg on src, both
    * partial-aggregated); lineage is truncated per round so plan
    * canonicalization cost stays constant. The driver-side loop only
    * schedules rounds and reads one converged-count per round — no row
    * data ever reaches the driver. (Large-star/small-star would halve
    * round count at extreme diameters; not needed at near-dup shapes.)
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    // lazy checkpoints: the first consumer job materializes the blocks in
    // passing (no separate eager job per frame), later rounds read blocks
    val und = edges
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint(eager = false)
    // seed comp = min(node, min neighbor) — one aggregation instead of a
    // first identity round; shallow (near-dup-shaped) clusters converge
    // at the seed and the loop only pays its verification pass
    var labels = und
      .groupBy(col("src").as("node"))
      .agg(min(col("dst")).as("nbr"))
      .select(col("node"), least(col("node"), col("nbr")).as("comp"))
      .localCheckpoint(eager = false)
    var changed = 1L
    var iter = 0
    // maxIter productive rounds + 1 confirming round (see the
    // non-convergence note below the loop)
    while (changed > 0 && iter < maxIter + 1) {
      iter += 1
      val nbrMin = und
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node"))
        .agg(min(col("comp")).as("nbr_comp"))
      // carry the changed flag inside the materialized frame: the
      // convergence count is then a scan of checkpointed rows, not a
      // second join against the previous labels
      val next = labels.alias("l")
        .join(nbrMin.alias("n"), Seq("node"), "left")
        .select(col("node"),
          least(col("l.comp"), coalesce(col("n.nbr_comp"), col("l.comp")))
            .as("comp"),
          (coalesce(col("n.nbr_comp"), col("l.comp")) < col("l.comp"))
            .as("changed"))
        .localCheckpoint(eager = false) // the count below materializes it
      changed = next.filter(col("changed")).count()
      labels = next.drop("changed")
    }
    // Unconverged labels are semantically wrong (a component would be
    // split) and would silently diverge from the exact transitive-closure
    // oracles — fail loudly so the divergence is attributable. But a
    // final PRODUCTIVE round (changed > 0 at iter == maxIter) does not
    // itself prove non-convergence — it may have applied the last
    // improvement, with only the 0-change confirmation outstanding. The
    // loop above runs up to maxIter productive rounds; this throws only
    // when the round AFTER them still changes labels. Near-dup chains
    // have small diameter; reaching here means the edge set is not
    // dup-shaped and the caller should raise maxIter explicitly.
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents still unconverged after $maxIter productive " +
          s"rounds plus a confirming round ($changed labels changing); " +
          "raise maxIter for high-diameter edge sets")
    labels
  }

  /** Near-dup clusters over embedding-cosine edges: the corpus plus TWO
    * perturbed copies of each doc_id < 10 (scaled 1.001 and 1.002 — same
    * direction, cosine 1), so every cluster is a triangle {x, x', x''}
    * that closure must collapse to one component. Oracled against
    * DuckDB's recursive-CTE transitive closure over the identical edge
    * set (edge equality holds for the same reason dedup_embedding_cosine
    * is oracle-able: dup pairs sit at cosine ~1.0, non-dup pairs below
    * ~0.5 — nothing near the 0.99 threshold). */
  val dedupClusters: GraftQuery = GraftQuery(
    "dedup_clusters",
    (s, dir) => {
      val base = emb(s, dir).select(col("vec_id"), col("embedding"))
      def copy(offset: Int, scale: String) =
        emb(s, dir).filter(col("vec_id") < 10)
          .select((col("vec_id") + offset).as("vec_id"),
            expr(s"transform(embedding, x -> x * CAST($scale AS FLOAT))")
              .as("embedding"))
      val all = DedupOps
        .normalizedWithCappedBucket(
          base.unionAll(copy(1000000, "1.001")).unionAll(copy(2000000, "1.002")),
          "vec_id")
        .localCheckpoint()
      val a = all.select(col("vec_id").as("id_a"), col("bucket"),
        col("unit").as("u_a"))
      val b = all.select(col("vec_id").as("id_b"), col("bucket"),
        col("unit").as("u_b"))
      val edges = a.join(b, Seq("bucket"))
        .filter(col("id_a") < col("id_b"))
        .filter(graft.functions.Vec.vec_dot(col("u_a"), col("u_b")) >= 0.99)
        .select(col("id_a"), col("id_b"))
      connectedComponents(edges)
    },
    Some(
      """WITH RECURSIVE all_v AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000,
        |    list_transform(embedding, x -> x * CAST(1.001 AS FLOAT))
        |  FROM embeddings WHERE vec_id < 10
        |  UNION ALL
        |  SELECT vec_id + 2000000,
        |    list_transform(embedding, x -> x * CAST(1.002 AS FLOAT))
        |  FROM embeddings WHERE vec_id < 10),
        |edges AS (
        |  SELECT a.vec_id AS ia, b.vec_id AS ib FROM all_v a, all_v b
        |  WHERE a.vec_id < b.vec_id
        |    AND list_cosine_similarity(a.embedding, b.embedding) >= 0.99),
        |und AS (SELECT ia AS a, ib AS b FROM edges
        |        UNION SELECT ib, ia FROM edges),
        |reach AS (
        |  SELECT a, b FROM und
        |  UNION
        |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a)
        |SELECT a AS node, least(a, min(b)) AS component
        |FROM reach GROUP BY a""".stripMargin))

  // ---------------------------------------------------------------------
  // Deterministic hash buckets (split / sampling primitives)
  // ---------------------------------------------------------------------

  /** Appends a deterministic `bucket` column in [0, mod): the first four
    * hex nibbles of md5(salt + doc_id), mod `mod`. The salt decorrelates
    * independent uses (the split must not correlate with the sampling).
    * Pure column expressions — scan-speed, stable under re-partitioning,
    * reruns, and incremental ingest; exactly reproducible in any engine
    * with md5. */
  private def withHashBucket(df: DataFrame, salt: String,
      mod: Int): DataFrame =
    df.withColumn("hx", md5(concat(lit(salt), col("doc_id").cast("string"))))
      .withColumn("bucket", expr(
        s"""((locate(substring(hx, 1, 1), '0123456789abcdef') - 1) * 4096
           | + (locate(substring(hx, 2, 1), '0123456789abcdef') - 1) * 256
           | + (locate(substring(hx, 3, 1), '0123456789abcdef') - 1) * 16
           | + (locate(substring(hx, 4, 1), '0123456789abcdef') - 1)) % $mod"""
          .stripMargin))
      .drop("hx")

  /** The same bucket as a DuckDB scalar over a table exposing `doc_id`. */
  private def bucketDuckSql(salt: String, mod: Int): String =
    s"""((instr('0123456789abcdef', substr(md5('$salt' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
       | + (instr('0123456789abcdef', substr(md5('$salt' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
       | + (instr('0123456789abcdef', substr(md5('$salt' || CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
       | + (instr('0123456789abcdef', substr(md5('$salt' || CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % $mod"""
      .stripMargin

  /** Hash-mod split: bucket = md5("split:" + doc_id) taken 4 hex nibbles
    * at a time, mod 100; 80/10/10 by bucket range. Deterministic across
    * engines, reruns, partitionings, and ingest order — the property a
    * training pipeline needs so examples never migrate between train and
    * eval. Salting the key ("split:") decorrelates this split from any
    * other hash use of doc_id. */
  val sampleSplit: GraftQuery = GraftQuery(
    "sample_split",
    (s, dir) =>
      withHashBucket(docs(s, dir), "split:", 100)
        .select(col("doc_id"), col("bucket"),
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test").as("split")),
    Some(
      s"""SELECT doc_id, bucket,
         |  CASE WHEN bucket < 80 THEN 'train'
         |       WHEN bucket < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (
         |  SELECT doc_id, ${bucketDuckSql("split:", 100)} AS bucket
         |  FROM documents)""".stripMargin))

  /** Stratified down-sampling to a balanced corpus: every language is
    * sampled down to the size of the smallest language, deterministically
    * (docs keep/lose membership stably across reruns and ingest order —
    * a random() sample does not). Per-stratum rate in integer basis
    * points; membership = hash bucket (salt "strat:", mod 10000) below
    * the stratum's rate. The rates table is O(strata) — broadcast; the
    * corpus side is one scan + one hash, no shuffle of document rows at
    * all. */
  val sampleStratified: GraftQuery = GraftQuery(
    "sample_stratified",
    (s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("lang"))
      val counts = d.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
      val rates = counts
        .crossJoin(broadcast(counts.agg(min(col("cnt")).as("mn"))))
        .select(col("lang"), expr("mn * 10000 div cnt").as("rate_bp"))
      withHashBucket(d, "strat:", 10000)
        .join(broadcast(rates), "lang")
        .filter(col("bucket") < col("rate_bp"))
        .select(col("doc_id"), col("lang"))
    },
    Some(
      s"""WITH counts AS (
         |  SELECT lang, count(*) AS cnt FROM documents GROUP BY 1),
         |rates AS (
         |  SELECT lang,
         |    CAST((SELECT min(cnt) FROM counts) * 10000 // cnt AS BIGINT)
         |      AS rate_bp
         |  FROM counts)
         |SELECT d.doc_id, d.lang
         |FROM (SELECT doc_id, lang, ${bucketDuckSql("strat:", 10000)}
         |        AS bucket
         |      FROM documents) d
         |JOIN rates r ON d.lang = r.lang
         |WHERE d.bucket < r.rate_bp""".stripMargin))

  /** Target mixture for [[sampleMixture]], in integer percent (sums to
    * 100): the declared domain-mix a training run wants, independent of
    * what the raw corpus happens to contain. */
  val MixtureWeights: Seq[(String, Long)] =
    Seq("en" -> 40L, "fr" -> 20L, "es" -> 20L, "de" -> 10L, "zh" -> 10L)

  /** Domain-mixture resampling: deterministically down-sample each
    * language so the output matches a TARGET mixture (en 40%, fr/es 20%,
    * de/zh 10%) rather than [[sampleStratified]]'s balance-to-min — the
    * data-mixing step of a pretraining run (upweight one domain,
    * downweight another) expressed relationally.
    *
    * Arithmetic is integer end-to-end: the achievable output size is
    * T = min over langs of (cnt·100 div w) — the largest total for which
    * no lang's demand T·w div 100 exceeds its supply — and each lang
    * keeps docs whose hash bucket (salt "mix:", mod 10000) falls below
    * rate_bp = ceil(max(T·w div 100, 1)·10000 / cnt), capped at 10000:
    * the demand clamp + ceiling guarantee a weighted language's rate
    * never floors to zero. Same reproducibility story as the split:
    * membership survives reruns, re-partitioning, and ingest order, and
    * any engine with md5 computes the identical set.
    *
    * Scale shape: rates are O(langs) — broadcast; the corpus side is one
    * scan + one hash compare. No shuffle of document rows at all. */
  /** Per-language corpus counts, collected to the driver (O(langs)
    * rows). Documents with a null `lang` are excluded — a null key can
    * never match a weighted language in the membership join, so the
    * mixture is defined over classified docs only (run
    * `withPredictedLang` first if the column may be null). */
  private def langCounts(d: DataFrame): Map[String, Long] =
    d.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
      .collect()
      .flatMap(r => Option(r.getString(0)).map(_ -> r.getLong(1)))
      .toMap

  /** The integer rate table both mixture forms share, computed on the
    * driver in BigInt so no count/weight magnitude can overflow (the
    * former in-SQL `cnt * total` wrapped past Long at ~1e8 docs with
    * alpha-derived 1000×-scaled weights). T = min over langs of
    * (cnt·total div w) is the largest output for which no language's
    * demand exceeds its supply; each language's demand is clamped to ≥1
    * doc and its keep-rate is CEILING division capped at 10000, so a
    * weighted tail language is never floored out of the output (its
    * survival is then the hash draw, not the arithmetic). */
  private[graft] def mixtureRates(weights: Seq[(String, Long)],
      counts: Map[String, Long]): Seq[(String, Long)] = {
    val total = weights.map(w => BigInt(w._2)).sum
    val t = weights.map { case (l, w) => BigInt(counts(l)) * total / w }.min
    weights.map { case (l, w) =>
      val cnt = BigInt(counts(l))
      val demand = (t * w / total).max(BigInt(1))
      l -> ((demand * 10000 + cnt - 1) / cnt).min(BigInt(10000)).toLong
    }
  }

  /** One corpus scan: hash-bucket membership against a broadcast
    * O(langs) rate table. No document-row shuffle. */
  private def applyMixtureRates(d: DataFrame,
      rates: Seq[(String, Long)]): DataFrame = {
    val s = d.sparkSession
    import s.implicits._
    withHashBucket(d.select(col("doc_id"), col("lang")), "mix:", 10000)
      .join(broadcast(rates.toDF("lang", "rate_bp")), "lang")
      .filter(col("bucket") < col("rate_bp"))
      .select(col("doc_id"), col("lang"))
  }

  /** [[sampleMixture]]'s engine: resample `d` (doc_id, lang) to the
    * target `weights` (integer shares; any total). See the query doc for
    * the arithmetic. Weights must be positive (rejected up front — a
    * zero weight would null the achievable total and silently empty the
    * output), and every weighted language must exist in the corpus: an
    * absent stratum makes the target unachievable, so it raises here —
    * eagerly, when the frame is built — rather than silently
    * mis-targeting the mixture. Costs the corpus two scans total: the
    * counts aggregation and the membership scan. */
  def mixtureSample(d: DataFrame, weights: Seq[(String, Long)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"mixtureSample: every weight must be positive, got $weights")
    // a repeated language would emit two rate rows and the membership
    // join would match (and emit) each kept doc once per row
    val dups = weights.groupBy(_._1).collect { case (l, ws) if ws.size > 1 => l }
    require(dups.isEmpty,
      s"mixtureSample: duplicate language in weights: ${dups.mkString(", ")}")
    val counts = langCounts(d)
    val missing = weights.collect { case (l, _) if !counts.contains(l) => l }
    require(missing.isEmpty,
      s"mixtureSample: weighted language missing from corpus: ${missing.mkString(", ")}")
    applyMixtureRates(d, mixtureRates(weights, counts))
  }

  /** Temperature-scaled mixture (the multilingual-pretraining alpha
    * sampling of mT5/XLM-R): the target weights are DERIVED from the
    * corpus itself as w_l ∝ n_l^α rather than declared — α=1 keeps the
    * natural distribution, α=0 balances every language to the smallest
    * ([[sampleStratified]]'s regime), and the α=0.5 middle ground
    * upweights tail languages without drowning the head. `alphaBp` is α
    * in basis points (5000 = 0.5).
    *
    * Only the per-language COUNTS reach the driver (O(langs) rows, one
    * aggregation shared with the rate table — the corpus is scanned
    * exactly twice: counts, then membership); the power law runs there
    * once, then [[mixtureRates]]'s BigInt machinery does the work —
    * broadcast rates, hash-bucket membership, no document-row shuffle.
    * Weights carry a 1000× fixed-point scale so small corpora don't
    * collapse to equal integers (safe at any corpus size: the rate
    * arithmetic is BigInt). Null-`lang` docs are excluded (see
    * [[langCounts]]). Determinism: identical to mixtureSample's (hash
    * membership — reruns, repartitioning and ingest order all
    * irrelevant). */
  def mixtureAlpha(d: DataFrame, alphaBp: Long = 5000L): DataFrame = {
    require(alphaBp >= 0L && alphaBp <= 10000L,
      s"mixtureAlpha: alphaBp must be in [0, 10000], got $alphaBp")
    val counts = langCounts(d)
    require(counts.nonEmpty,
      "mixtureAlpha: no docs with a non-null lang (empty corpus, or an " +
        "unclassified one — run withPredictedLang first)")
    // α = 0.5 computes via sqrt directly (not pow(n, 0.5)) so agreement
    // with the DuckDB oracle's correctly-rounded sqrt is structural, not
    // an empirical property of the running JVM's 1-ulp pow.
    def powAlpha(n: Long): Double =
      if (alphaBp == 5000L) math.sqrt(n.toDouble)
      else math.pow(n.toDouble, alphaBp / 10000.0)
    val weights = counts.toSeq.sortBy(_._1).map { case (l, n) =>
      l -> math.max(1L, math.round(powAlpha(n) * 1000.0))
    }
    applyMixtureRates(d, mixtureRates(weights, counts))
  }

  /** Hash-oracled since round 9 at the query's α = 0.5: the driver-side
    * weight is round(sqrt(n)·1000) computed with math.sqrt directly
    * (since round 10 — not pow(n, 0.5), whose sqrt-exactness is only an
    * empirical property of the JVM's 1-ulp pow), and sqrt/round are
    * correctly-rounded on both sides, so the whole rate table is
    * reproducible in SQL with HUGEINT arithmetic mirroring the BigInt
    * machinery. Other α values route through a general driver-side pow
    * and stay spec-gated (α-endpoint equivalences, monotone tail-share
    * growth). */
  val sampleMixtureAlpha: GraftQuery = GraftQuery(
    "sample_mixture_alpha",
    (s, dir) =>
      mixtureAlpha(docs(s, dir).select(col("doc_id"), col("lang"))),
    Some(
      s"""WITH counts AS (
         |  SELECT lang, count(*) AS cnt FROM documents
         |  WHERE lang IS NOT NULL GROUP BY 1),
         |w AS (
         |  SELECT lang, cnt,
         |    greatest(1, CAST(round(sqrt(CAST(cnt AS DOUBLE)) * 1000)
         |      AS BIGINT)) AS w
         |  FROM counts),
         |tot AS (SELECT CAST(sum(w) AS HUGEINT) AS total FROM w),
         |t AS (SELECT min(CAST(cnt AS HUGEINT) * tot.total // w) AS t
         |      FROM w, tot),
         |rates AS (
         |  SELECT lang, least(10000, CAST(
         |    (greatest(t.t * w // tot.total, 1) * 10000 + cnt - 1) // cnt
         |    AS BIGINT)) AS rate_bp
         |  FROM w, t, tot)
         |SELECT d.doc_id, d.lang
         |FROM (SELECT doc_id, lang, ${bucketDuckSql("mix:", 10000)}
         |        AS bucket
         |      FROM documents) d
         |JOIN rates r ON d.lang = r.lang
         |WHERE d.bucket < r.rate_bp""".stripMargin))

  val sampleMixture: GraftQuery = GraftQuery(
    "sample_mixture",
    (s, dir) =>
      mixtureSample(docs(s, dir).select(col("doc_id"), col("lang")),
        MixtureWeights),
    Some(
      s"""WITH weights(lang, w) AS (VALUES ${MixtureWeights
            .map { case (l, w) => s"('$l', $w)" }.mkString(", ")}),
         |cw AS (
         |  SELECT c.lang, c.cnt, w.w
         |  FROM (SELECT lang, count(*) AS cnt FROM documents GROUP BY 1) c
         |  JOIN weights w ON c.lang = w.lang),
         |t AS (SELECT min(cnt * 100 // w) AS t FROM cw),
         |rates AS (
         |  SELECT lang, least(10000,
         |    (greatest(t.t * w // 100, 1) * 10000 + cnt - 1) // cnt)
         |    AS rate_bp
         |  FROM cw, t)
         |SELECT d.doc_id, d.lang
         |FROM (SELECT doc_id, lang, ${bucketDuckSql("mix:", 10000)}
         |        AS bucket
         |      FROM documents) d
         |JOIN rates r ON d.lang = r.lang
         |WHERE d.bucket < r.rate_bp""".stripMargin))

  // ---------------------------------------------------------------------
  // Quality calibration (per-language score quantiles)
  // ---------------------------------------------------------------------

  /** The quantiles [[qualityCalibration]] reports, in basis points. */
  val CalibrationQs: Seq[Int] = Seq(2500, 5000, 7500, 9000)

  /** Per-language quality-score quantiles — the evidence a pipeline
    * owner reads to SET the curation floor ([[curateCorpus]]'s
    * `qualityFloorBp`) instead of guessing it. Exact integer
    * quantiles: value at rank ceil(n·q) per language, computed with one
    * per-language rank window joined against a broadcast (lang × q)
    * target-rank table — deterministic under ties by construction (the
    * VALUE at a rank is unique even when the tie order isn't), so the
    * DuckDB oracle reproduces it bit for bit.
    *
    * At 100 TB the rank window over a whole language is the expensive
    * exact path; `approx_percentile` (KLL-style sketch, one partial-agg
    * pass) is the at-scale variant, and CurationOpsSpec pins it within
    * tolerance of these exact values so swapping it in is a measured,
    * not hopeful, change. */
  /** The exact-quantile construction over any (lang, bp) frame —
    * [[qualityCalibration]]'s engine, also exercised directly by the
    * generative sweep so the sweep tests the shipped arithmetic, not a
    * copy of it. */
  def calibrate(scored: DataFrame): DataFrame = {
    val s = scored.sparkSession
    import s.implicits._
    val ranked = scored.withColumn("rn",
      row_number().over(Window.partitionBy(col("lang")).orderBy(col("bp"))))
    val targets = scored.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(CalibrationQs.toDF("q_bp")))
      .select(col("lang"), col("q_bp"),
        expr("CAST(ceil(n * q_bp / 10000.0) AS BIGINT)").as("target"))
    ranked.join(broadcast(targets),
        ranked("lang") === targets("lang") && col("rn") === col("target"))
      .select(ranked("lang"), col("q_bp"), col("bp").as("value_bp"))
  }

  val qualityCalibration: GraftQuery = GraftQuery(
    "quality_calibration",
    (s, dir) =>
      // slim (lang, bp) checkpoint: the rank window and the per-lang
      // counts both read it — the score expression evaluates once
      calibrate(docs(s, dir)
        .select(col("lang"), expr(TextOps.qualityBpSparkSql).as("bp"))
        .localCheckpoint(eager = false)),
    Some(
      s"""WITH scored AS (
         |  SELECT lang, ${TextOps.qualityBpDuckSql} AS bp FROM documents),
         |ranked AS (
         |  SELECT lang, bp,
         |    row_number() OVER (PARTITION BY lang ORDER BY bp) AS rn
         |  FROM scored),
         |targets AS (
         |  SELECT c.lang, q.q_bp,
         |    CAST(ceil(c.n * q.q_bp / 10000.0) AS BIGINT) AS target
         |  FROM (SELECT lang, count(*) AS n FROM scored GROUP BY 1) c
         |  CROSS JOIN (VALUES ${CalibrationQs.map("(" + _ + ")").mkString(", ")})
         |    AS q(q_bp))
         |SELECT r.lang, t.q_bp, r.bp AS value_bp
         |FROM ranked r JOIN targets t
         |  ON r.lang = t.lang AND r.rn = t.target""".stripMargin))

  // ---------------------------------------------------------------------
  // Quality-weighted sampling
  // ---------------------------------------------------------------------

  /** Quality-weighted downsample: keep each doc with probability ~equal
    * to its integer quality score in basis points (a 9 000 bp doc is
    * kept ~9× as often as a 1 000 bp doc) — the upsample-the-good-tail
    * step of corpus construction, but deterministic: membership is
    * md5-bucket < score, so it survives reruns, re-partitioning, and
    * incremental ingest, and any engine with md5 reproduces the exact
    * set. Pure column expressions — scan-speed, no shuffle at all.
    *
    * "~": the 16-bit-hash-mod-10000 bucket is not perfectly uniform
    * (buckets below 5536 occur 7/65536, the rest 6/65536 — ≤1% absolute
    * deviation in keep rate). Both engines share the identical biased
    * bucket, so the oracle gate is exact; size the corpus from measured
    * keep counts, not the nominal rate, if that ≤1% matters. */
  val qualityWeighted: GraftQuery = GraftQuery(
    "sample_quality_weighted",
    (s, dir) =>
      withHashBucket(docs(s, dir)
        .withColumn("quality_bp", expr(TextOps.qualityBpSparkSql)),
        "qw:", 10000)
        .filter(col("bucket") < col("quality_bp"))
        .select(col("doc_id"), col("quality_bp")),
    Some(
      s"""SELECT doc_id, ${TextOps.qualityBpDuckSql} AS quality_bp
         |FROM documents
         |WHERE ${bucketDuckSql("qw:", 10000)}
         |  < ${TextOps.qualityBpDuckSql}""".stripMargin))

  // ---------------------------------------------------------------------
  // Per-domain quota (source balancing)
  // ---------------------------------------------------------------------

  /** Docs kept per source by [[domainCap]]. */
  val DomainCapN = 10

  /** Per-domain quota: keep at most `cap` docs per `source`, chosen by
    * a deterministic hash rank — NOT arrival order — so the kept set is
    * identical under re-partitioning, reruns, and incremental ingest
    * (the web-corpus "max N pages per domain" rule).
    *
    * Scale shape: one window shuffle keyed by source. A mega-domain
    * sorts only its own partition (rank by an 8-byte hash prefix, not
    * by text), and with AQE skew-split plus the early `rnk <= cap`
    * cutoff inside the sort, nothing global ever materializes. */
  def capPerDomain(d: DataFrame, cap: Int = DomainCapN): DataFrame = {
    val byHash = Window.partitionBy(col("source"))
      .orderBy(col("hx"), col("doc_id"))
    d.withColumn("hx",
        md5(concat(lit("domcap:"), col("doc_id").cast("string"))))
      .withColumn("rnk", row_number().over(byHash))
      .filter(col("rnk") <= cap)
      .select(col("doc_id"), col("source"), col("rnk"))
  }

  val domainCap: GraftQuery = GraftQuery(
    "sample_domain_cap",
    (s, dir) => capPerDomain(
      docs(s, dir).select(col("doc_id"), col("source"))),
    Some(
      s"""SELECT doc_id, source, rnk FROM (
         |  SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY md5('domcap:' || CAST(doc_id AS VARCHAR)), doc_id)
         |      AS rnk
         |  FROM documents)
         |WHERE rnk <= $DomainCapN""".stripMargin))

  // ---------------------------------------------------------------------
  // Train/eval decontamination
  // ---------------------------------------------------------------------

  /** Eval-set contamination check: for every TEST-split document, the
    * share of its distinct token-5-grams that also occur anywhere in the
    * TRAIN split (the standard n-gram-overlap decontamination test run
    * before an eval set is trusted). Reuses the [[sampleSplit]] buckets
    * (salt "split:"), so it decontaminates exactly the split this engine
    * ships.
    *
    * Scale shape: the train side collapses to DISTINCT grams (one
    * hash-shuffle with map-side partial distinct); the test side is tiny
    * by construction (10% of docs); the overlap is an equi-join on the
    * gram. No pairwise doc-vs-doc comparison anywhere.
    *
    * The engine side runs the dedup family's trick end-to-end: grams
    * never materialize as strings — [[graft.functions.Vec
    * .shingleHashes]] (codegen'd kernel) emits each doc's DISTINCT
    * portable 5-gram hash set straight off the token array, and the
    * overlap joins 8-byte longs instead of ~35-byte gram strings. The
    * oracle keeps joining the literal strings: overlap COUNTS are what
    * is compared, and those agree up to 60-bit hash collisions
    * (p ≈ n²/2⁶¹ — immaterial at any n this engine will see per join). */
  val decontaminate: GraftQuery = GraftQuery(
    "text_decontaminate",
    (s, dir) => {
      val bucketed = withHashBucket(docs(s, dir), "split:", 100)
        // the val split (buckets 80-89) plays no role — drop it BEFORE
        // the gram arrays are built, not after
        .filter(col("bucket") < 80 || col("bucket") >= 90)
        .withColumn("toks", split(lower(col("text")), "\\s+"))
        .filter(size(col("toks")) >= 5)
        .withColumn("grams",
          graft.functions.Vec.shingle_hashes(col("toks"), 5))
      val trainGrams = bucketed.filter(col("bucket") < 80)
        .select(explode(col("grams")).as("gram")).distinct()
      bucketed.filter(col("bucket") >= 90)
        .select(col("doc_id"), explode(col("grams")).as("gram"))
        .join(trainGrams.withColumn("hit", lit(1L)), Seq("gram"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("total_grams"),
          sum(coalesce(col("hit"), lit(0L))).as("hits"))
        .select(col("doc_id"), col("total_grams"),
          expr("hits * 10000 div total_grams").as("matched_bp"))
    },
    Some(
      s"""WITH bucketed AS (
         |  SELECT doc_id, ${bucketDuckSql("split:", 100)} AS bucket,
         |    regexp_split_to_array(lower(text), '\\s+') AS toks
         |  FROM documents),
         |grams AS (
         |  SELECT doc_id, bucket,
         |    unnest(list_distinct(list_transform(
         |      generate_series(1, len(toks) - 4),
         |      i -> array_to_string(toks[i:i+4], ' ')))) AS gram
         |  FROM bucketed WHERE len(toks) >= 5),
         |train_grams AS (
         |  SELECT DISTINCT gram FROM grams WHERE bucket < 80)
         |SELECT g.doc_id,
         |  count(*) AS total_grams,
         |  CAST(sum(CASE WHEN t.gram IS NULL THEN 0 ELSE 1 END) * 10000
         |    // count(*) AS BIGINT) AS matched_bp
         |FROM grams g LEFT JOIN train_grams t ON g.gram = t.gram
         |WHERE g.bucket >= 90
         |GROUP BY 1""".stripMargin))

  /** Removes from `d` (doc_id, text, ...) every document whose distinct
    * token-5-gram overlap with the `eval` corpus reaches `maxMatchedBp`
    * basis points — the [[decontaminate]] probe applied as a FILTER:
    * curate a training corpus against a held-out eval set so no eval
    * content leaks into the shards (`curate --decontaminate-against`).
    *
    * Scale shape: eval sets are small by nature, so their distinct gram
    * hashes broadcast; the corpus side is one scan (grams never
    * materialize as strings — the codegen'd portable shingle kernel) +
    * one keyed agg + a left-anti join on doc_id. Docs with < 5 tokens
    * carry no grams and always pass. */
  def decontaminateAgainst(d: DataFrame, eval: DataFrame,
      maxMatchedBp: Long = 1000L): DataFrame = {
    def grams(df: DataFrame) = df
      .withColumn("toks", split(lower(col("text")), "\\s+"))
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"),
        explode(graft.functions.Vec.shingle_hashes(col("toks"), 5))
          .as("gram"))
    val evalGrams = grams(eval).select("gram").distinct()
    val contaminated = grams(d)
      .join(broadcast(evalGrams.withColumn("hit", lit(1L))),
        Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(expr("sum(coalesce(hit, 0)) * 10000 div count(1)")
        .as("matched_bp"))
      .filter(col("matched_bp") >= maxMatchedBp)
      .select("doc_id")
    d.join(contaminated, Seq("doc_id"), "left_anti")
  }

  // ---------------------------------------------------------------------
  // Per-group quality selection
  // ---------------------------------------------------------------------

  /** Top-3 documents per language by integer quality score
    * ([[TextOps.qualityBpSparkSql]]) — per-group top-k via ranked window;
    * group cardinality (languages) is small, per-group sort is the
    * shuffle, exactly the shape Spark's WindowExec handles. */
  val curationTopK: GraftQuery = GraftQuery(
    "curation_topk",
    (s, dir) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("quality_bp").desc, col("doc_id"))
      docs(s, dir)
        .select(col("lang"), col("doc_id"),
          expr(TextOps.qualityBpSparkSql).as("quality_bp"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
    },
    Some(
      s"""SELECT lang, doc_id, quality_bp, rnk FROM (
         |  SELECT lang, doc_id,
         |    ${TextOps.qualityBpDuckSql} AS quality_bp,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY ${TextOps.qualityBpDuckSql} DESC, doc_id) AS rnk
         |  FROM documents)
         |WHERE rnk <= 3""".stripMargin))

  // ---------------------------------------------------------------------
  // Vocabulary / document frequency
  // ---------------------------------------------------------------------

  /** Document frequency of whitespace tokens with a min-df floor —
    * vocabulary building. array_distinct BEFORE explode keeps the
    * shuffle at one row per (doc, distinct token); count() partial-aggs
    * map-side, so even 'the' never concentrates raw rows on one
    * reducer. */
  val docFreq: GraftQuery = GraftQuery(
    "text_doc_freq",
    (s, dir) =>
      docs(s, dir)
        .select(explode(array_distinct(split(lower(col("text")), "\\s+")))
          .as("token"))
        .filter(col("token") =!= "")
        .groupBy("token").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 25),
    Some(
      """SELECT token, count(*) AS df FROM (
        |  SELECT doc_id,
        |    unnest(list_distinct(regexp_split_to_array(lower(text), '\s+')))
        |      AS token
        |  FROM documents)
        |WHERE token <> ''
        |GROUP BY token HAVING count(*) >= 25""".stripMargin))

  /** Top-3 characteristic terms per document by an integer TF-IDF
    * variant: score = tf · 10000 div df (linear inverse document
    * frequency — rank-equivalent to tf/df, and exactly computable in
    * both engines, unlike log-idf whose libm rounding may differ).
    * min-df floor of 3 drops hapax noise; ties break by token. Shape:
    * (doc, term) tf counts and global df counts are both
    * partial-aggregated; the df side joins in by term. The per-doc
    * top-k window partitions by doc_id — never global. */
  val topTerms: GraftQuery = GraftQuery(
    "text_top_terms",
    (s, dir) => {
      val terms = docs(s, dir)
        .select(col("doc_id"),
          explode(split(lower(col("text")), "\\s+")).as("token"))
        .filter(col("token") =!= "")
      val tf = terms.groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val df = terms.select(col("doc_id"), col("token")).distinct()
        .groupBy(col("token")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= 3)
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("token"))
      tf.join(df, "token")
        .withColumn("score", expr("tf * 10000 div df"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("token"), col("score"), col("rnk"))
    },
    Some(
      """WITH terms AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(lower(text), '\s+')) AS token
        |  FROM documents),
        |terms_ne AS (SELECT * FROM terms WHERE token <> ''),
        |tf AS (
        |  SELECT doc_id, token, count(*) AS tf FROM terms_ne GROUP BY 1, 2),
        |df AS (
        |  SELECT token, count(*) AS df
        |  FROM (SELECT DISTINCT doc_id, token FROM terms_ne)
        |  GROUP BY 1 HAVING count(*) >= 3)
        |SELECT doc_id, token, score, rnk FROM (
        |  SELECT tf.doc_id, tf.token,
        |    CAST(tf.tf * 10000 // df.df AS BIGINT) AS score,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf * 10000 // df.df DESC, tf.token) AS rnk
        |  FROM tf JOIN df ON tf.token = df.token)
        |WHERE rnk <= 3""".stripMargin))

  // ---------------------------------------------------------------------
  // End-to-end curation pipeline
  // ---------------------------------------------------------------------

  /** The composed curation pipeline a training-data user actually runs —
    * quality floor, exact dedup, near-dup cluster collapse, split
    * assignment — as ONE library call over a (doc_id, text) corpus:
    *
    *  1. quality floor: integer-basis-point score
    *     ([[TextOps.qualityBpSparkSql]]) >= `qualityFloorBp` — scan-speed
    *     column expression;
    *  2. exact dedup: min doc_id per normalized-text fingerprint (one
    *     hash shuffle);
    *  3. near-dup collapse: MinHash-LSH pairs
    *     ([[DedupOps.minhashNearDupPairs]], banded candidates — never
    *     all-pairs), transitive closure ([[connectedComponents]] — pair
    *     graphs only, O(detected dups) not O(corpus)), keep each
    *     cluster's min doc_id;
    *  4. deterministic 80/10/10 split (salt "split:", the same buckets
    *     [[sampleSplit]] and [[decontaminate]] use).
    *
    * Every stage is shuffle-bounded by keys or detected duplicates —
    * nothing here is quadratic in the corpus. Returns (doc_id,
    * quality_bp, split) for the surviving docs; join back to the corpus
    * for payload columns (cheaper than carrying text through the dedup
    * shuffles).
    *
    * Text is scanned EXACTLY ONCE: the quality score, the normalized-text
    * fingerprint, and the MinHash signature all come out of the same scan
    * stage, and the slim (id, score, fp, signature) frame is checkpointed
    * before any shuffle consumes it. At 100 TB that single pass is the
    * dominant cost by construction — every later stage moves 8-byte
    * hashes, never text. */
  def curateCorpus(d: DataFrame, qualityFloorBp: Long = 3000L,
      nearDupThreshold: Double = 0.4): DataFrame = {
    // one text scan: score + fingerprint + shingle hashes + signature;
    // docs under 5 tokens carry null signatures (nothing to shingle) and
    // simply never reach the near-dup candidate join
    val scored = d
      .withColumn("quality_bp", expr(TextOps.qualityBpSparkSql))
      .filter(col("quality_bp") >= qualityFloorBp)
      .withColumn("fp", md5(regexp_replace(lower(col("text")), "\\s+", " ")))
      .withColumn("toks", split(lower(col("text")), "\\s+"))
      .withColumn("sh_hashes", when(size(col("toks")) >= 5,
        graft.functions.Vec.shingle_hashes(col("toks"), 5)))
      .select(col("doc_id"), col("quality_bp"), col("fp"),
        col("sh_hashes"),
        when(col("sh_hashes").isNotNull,
          graft.functions.Vec.minhash_sig(col("sh_hashes"),
            DedupOps.NumHashes)).as("mh_arr"))
      .localCheckpoint(eager = false) // first consumer materializes
    val exactKeep = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1).drop("fp", "rn")
    val pairs = DedupOps
      .minhashPairsFromSignatures(
        exactKeep.filter(col("mh_arr").isNotNull)
          .select(col("doc_id"), col("sh_hashes"), col("mh_arr")),
        nearDupThreshold)
      .select(col("id_a"), col("id_b"))
    val nonReps = connectedComponents(pairs)
      .filter(col("node") =!= col("comp"))
      .select(col("node").as("doc_id"))
    withHashBucket(
      exactKeep.join(nonReps, Seq("doc_id"), "left_anti"), "split:", 100)
      .select(col("doc_id"), col("quality_bp"),
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test").as("split"))
  }

  /** Approximate corpus-wide heavy hitters via the Misra-Gries mergeable
    * summary ([[graft.functions.MgTopKAgg]]): the scale path for "top
    * terms" when the distinct-term set itself is too large to shuffle —
    * state is capped at `capacity` entries per partition, partials merge
    * map-side, and only `capacity` rows ever cross the exchange (the
    * exact [[docFreq]]/[[topTerms]] shuffle one row per DISTINCT term).
    * Guarantee: every term with true frequency > N/(capacity+1) is
    * present, estimates undercount by at most N/(capacity+1) (N = total
    * tokens). Rows-only: estimates depend on encounter order, so no
    * portable oracle exists — TopKSpec pins the guarantee against exact
    * counts with forced partial/merge/serde paths. */
  val topTermsApprox: GraftQuery = GraftQuery(
    "text_top_terms_approx",
    (s, dir) => {
      val tokens = docs(s, dir)
        .select(explode(split(lower(col("text")), "\\s+")).as("token"))
        .filter(col("token") =!= "")
      tokens
        .agg(graft.functions.TopK.mg_top_k(col("token"), 50, 4096).as("top"))
        .select(posexplode(col("top")).as(Seq("rnk", "entry")))
        .select((col("rnk") + 1).as("rnk"), col("entry.term").as("term"),
          col("entry.cnt_est").as("cnt_est"))
    },
    None)

  /** Driver-visible pipeline run over the corpus + injected near-copies
    * (so the dedup stages do real work at every scale factor). FULLY
    * hash-oracled since round 9: the signature hashes are portable, so
    * the whole composition — quality floor, exact-dedup keep, LSH
    * candidate generation, Jaccard verify, transitive-closure collapse
    * (a recursive CTE mirroring the label-propagation fixpoint, the
    * [[dedupClusters]] pattern), and the split assignment — is one
    * DuckDB statement recomputing every stage. CurationOpsSpec
    * additionally pins the semantics (injected copies collapse to their
    * originals, survivors are pairwise non-duplicate, floor and split
    * invariants hold). */
  val curationPipeline: GraftQuery = GraftQuery(
    "curation_pipeline",
    (s, dir) => curateCorpus(DedupOps.withNearDups(docs(s, dir))),
    Some {
      val floor = java.lang.Double.toString(0.4 * 0.6)
      s"""WITH RECURSIVE src AS (${DedupOps.NearDupsSrcSql}),
         |scored AS (
         |  SELECT doc_id, text, ${TextOps.qualityBpDuckSql} AS quality_bp
         |  FROM src
         |  WHERE ${TextOps.qualityBpDuckSql} >= 3000),
         |ek AS (
         |  SELECT doc_id, text, quality_bp FROM (
         |    SELECT doc_id, text, quality_bp, row_number() OVER (
         |      PARTITION BY md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))
         |      ORDER BY doc_id) AS rn
         |    FROM scored) WHERE rn = 1),
         |${DedupOps.sigCtesSql("ek", "")},
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM capped a JOIN capped b
         |    ON a.band = b.band AND a.band_key = b.band_key
         |    AND a.doc_id < b.doc_id),
         |edges AS (
         |  SELECT p.id_a, p.id_b FROM pairs p
         |  JOIN mh sa ON sa.doc_id = p.id_a
         |  JOIN mh sb ON sb.doc_id = p.id_b
         |  WHERE ${DedupOps.estSql("sa.mh_arr", "sb.mh_arr")} >= $floor
         |    AND ${DedupOps.jaccardGateSql("sa.sh_hashes", "sb.sh_hashes", 0.4)}),
         |und AS (SELECT id_a AS a, id_b AS b FROM edges
         |        UNION SELECT id_b, id_a FROM edges),
         |reach AS (
         |  SELECT a, b FROM und
         |  UNION
         |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
         |losers AS (
         |  SELECT a AS doc_id FROM reach GROUP BY a
         |  HAVING least(a, min(b)) <> a)
         |SELECT e.doc_id, e.quality_bp,
         |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id, quality_bp,
         |        ${bucketDuckSql("split:", 100)} AS bucket FROM ek) e
         |WHERE e.doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin
    })

  val all: Seq[GraftQuery] =
    Seq(dedupClusters, sampleSplit, sampleStratified, sampleMixture,
      sampleMixtureAlpha,
      domainCap, qualityWeighted, qualityCalibration, decontaminate,
      curationTopK, docFreq, topTerms, topTermsApprox, curationPipeline)
}
