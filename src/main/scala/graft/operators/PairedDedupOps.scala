package graft.operators

import graft.GraftQuery
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Paired-sample (image + caption) near-duplicate detection — the
  * sample-level dedup a multimodal training corpus (image-text pairs
  * in the LAION/DataComp mold) needs and neither single-modality
  * operator provides.
  *
  * POLICY — conjunctive, and deliberately so: two SAMPLES are
  * duplicates iff their images are perceptual near-dups
  * ([[ImageDedupOps]] dHash at Hamming <= MaxHamming) AND their
  * captions are near-dups (char-3-gram Jaccard >= [[CaptionJaccard]],
  * the [[DedupOps.ngramJaccard]] kernel). A re-encoded image under a
  * genuinely different caption is a DIFFERENT training sample — the
  * caption is the supervision signal, and dropping the pair would
  * lose it; conversely a re-typed caption on an unrelated image is
  * just common boilerplate. The disjunctive forms are the existing
  * single-modality operators run alone (`multimodal_phash_dedup` for
  * images, the text dedup family for captions) — this operator adds
  * the AND.
  *
  * There is deliberately NO pair-level decontamination twin: eval-set
  * leakage is DISJUNCTIVE (a benchmark image leaking under a fresh
  * caption — or a benchmark caption under a fresh image — already
  * contaminates), so the right screens are the existing single-modality
  * ones ([[ImageDedupOps.phashContamination]] and the text
  * decontaminate family), run on each side of the pair. A conjunctive
  * decontaminate would miss exactly the leaks that matter.
  *
  * SCALE SHAPE: the image side drives candidate generation — banded
  * 16-bit phash keys through the capped bucket join (payloads decode
  * per partition and never shuffle; only 16-byte hash rows cross an
  * exchange). Caption gram arrays then materialize ONLY for ids that
  * appear in an image-candidate pair (semi-join prune, un-hinted — AQE
  * broadcasts it when small; the [[DedupOps.ngramJaccard]]
  * discipline) — at 100 TB the caption
  * verify is proportional to image candidates, not corpus size, and
  * caption text never joins the banded exchange at all.
  *
  * Fixture: [[ImageDedupOps.imageAssets]]' planted quadruples
  * {i, i+1000 re-encode, i+2000 brightness, i+3000 resize} paired
  * with captions that exercise every policy branch — i+1000 carries
  * i's caption verbatim (sample dup), i+2000 a disjoint caption
  * (image dup, NOT a sample dup: the discriminating case), i+3000 a
  * one-word edit (near-dup caption, Jaccard ~0.75), and two UNRELATED
  * base images share one caption verbatim (never a candidate — the
  * image side gates, so the pair must stay invisible). */
object PairedDedupOps {

  /** Caption Jaccard floor (basis points / 10000), the
    * [[DedupOps.ngramJaccard]] verify threshold. */
  val CaptionJaccard = 0.5

  // -------------------------------------------------------------------
  // Deterministic caption fixture
  // -------------------------------------------------------------------
  // Pure functions of the pair id, alphanumeric + spaces only: the
  // oracle embeds every caption as a SQL string literal and recomputes
  // the same grams through the portable hash, so any escaping subtlety
  // would surface as a hash mismatch rather than stay invisible.

  private val Adjs =
    Vector("quiet", "amber", "frozen", "narrow", "sunlit", "mossy",
      "winding", "pale")
  private val Nouns =
    Vector("river", "harbor", "meadow", "canyon", "orchard", "glacier",
      "village", "lagoon")
  private val Tails =
    Vector("at dawn", "after rain", "in summer", "under fog",
      "before dusk", "in spring", "at night", "under clouds")
  private val AltAdjs =
    Vector("crowded", "dusty", "humid", "silent", "rugged", "golden",
      "remote", "foggy")

  /** Base caption of seed `i` — the one its +1000 re-encode repeats
    * verbatim. */
  private def baseCaption(i: Long): String = {
    val a = Adjs(((i * 7 + 3) % Adjs.size).toInt)
    val n = Nouns(((i * 5 + 1) % Nouns.size).toInt)
    val t = Tails(((i * 11 + 2) % Tails.size).toInt)
    s"a $a $n photographed $t scene $i"
  }

  /** Caption of pair `id` over the [[ImageDedupOps.imageAssets]] id
    * space. Branches (see object doc): +1000 verbatim, +2000 disjoint
    * words, +3000 one-word edit; base 21 repeats base 20's caption
    * verbatim (caption-dup, image-unrelated — must stay invisible). */
  def captionFor(id: Long): String =
    if (id >= 3000L) {
      val i = id - 3000L
      val a = AltAdjs(((i * 7 + 3) % AltAdjs.size).toInt)
      val n = Nouns(((i * 5 + 1) % Nouns.size).toInt)
      val t = Tails(((i * 11 + 2) % Tails.size).toInt)
      s"a $a $n photographed $t scene $i"
    } else if (id >= 2000L) {
      val i = id - 2000L
      s"studio portrait number $i with tripod lighting and backdrop"
    } else if (id >= 1000L) baseCaption(id - 1000L)
    else if (id == 21L) baseCaption(20L)
    else baseCaption(id)

  /** The paired fixture: every [[ImageDedupOps.imageAssets]] image
    * with its [[captionFor]] caption — (pair_id, payload, caption). */
  def pairedAssets(n: Int): Seq[(Long, Array[Byte], String)] =
    ImageDedupOps.imageAssets(n)
      .map(a => (a.asset_id, a.payload, captionFor(a.asset_id)))

  // -------------------------------------------------------------------
  // The operator
  // -------------------------------------------------------------------

  /** Sample-level near-dup pairs over a (pair_id, payload, caption)
    * frame: image candidates from the banded phash join, caption
    * verify on candidates only. Output (id_a, id_b, hamming,
    * caption_jaccard_bp). */
  def pairedNearDupPairs(samples: DataFrame): DataFrame = {
    val hashes = ImageDedupOps.imageHashRows(
      samples.select(col("pair_id").as("asset_id"), col("payload")))
      .localCheckpoint() // ONE decode: the banded self-join reads
                         // 16-byte rows, never a second decode pass
    pairedFromHashes(hashes, samples.select(col("pair_id"), col("caption")))
  }

  /** The post-decode half of [[pairedNearDupPairs]] — callers that
    * already hold (materialized) hash rows reuse them here, keeping
    * the family's one-decode discipline. */
  def pairedFromHashes(hashes: DataFrame, captions: DataFrame): DataFrame =
    captionVerify(
      ImageDedupOps.phashNearDupPairs(hashes)
        .localCheckpoint(), // reused: ids prune + the verify join
      captions)

  /** The caption-verify stage on its own: keep of `imgPairs`
    * (id_a, id_b, hamming) only the pairs whose captions clear the
    * gram-Jaccard floor. Gram arrays materialize ONLY for ids that
    * appear in an image pair (semi-join prune with no forced
    * broadcast — AQE decides, see the in-code note) — callers
    * hand the FULL captions frame and pay proportional to candidates.
    * Shared by the batch operator, the streaming gate's intra stage,
    * and the at-rest report ([[graft.store.IndexStore.pairDupes]]). */
  def captionVerify(imgPairs: DataFrame, captions: DataFrame): DataFrame = {
    val candIds = imgPairs
      .select(explode(array(col("id_a"), col("id_b"))).as("pair_id"))
      .distinct()
    // no broadcast HINT on the prune: per-batch callers (the gate) have
    // batch-bounded candidates and AQE broadcasts them anyway, but the
    // corpus-wide at-rest report ([[graft.store.IndexStore.pairDupes]])
    // can surface corpus-linear candidate ids on a dup-heavy corpus —
    // forcing those to the driver would be the scale defect; a shuffled
    // semi-join is the safe shape at every size
    val grams = captions
      .join(candIds, Seq("pair_id"), "left_semi")
      .select(col("pair_id"),
        graft.functions.Vec.char_gram_hashes(col("caption"), 3)
          .as("grams"))
    imgPairs
      .join(grams.select(col("pair_id").as("id_a"),
        col("grams").as("g_a")), "id_a")
      .join(grams.select(col("pair_id").as("id_b"),
        col("grams").as("g_b")), "id_b")
      .withColumn("inter",
        size(array_intersect(col("g_a"), col("g_b"))).cast("long"))
      .withColumn("uni",
        size(array_union(col("g_a"), col("g_b"))).cast("long"))
      .filter(col("inter").cast("double") / col("uni") >= CaptionJaccard)
      .select(col("id_a"), col("id_b"), col("hamming"),
        expr("inter * 10000 div uni").as("caption_jaccard_bp"))
  }

  // -------------------------------------------------------------------
  // Driver queries + oracles
  // -------------------------------------------------------------------

  private def fixtureDf(spark: org.apache.spark.sql.SparkSession)
      : DataFrame = {
    import spark.implicits._
    pairedAssets(ImageDedupOps.NumImages)
      .toDF("pair_id", "payload", "caption")
  }

  /** Driver-side (pair_id, phash, caption) rows for the VALUES oracle —
    * hashes through the SAME kernel the engine runs. */
  private lazy val oracleRows: Seq[(Long, Long, String)] =
    ImageDedupOps.imageAssets(ImageDedupOps.NumImages).map { a =>
      val h = ImageDedupOps.hashAsset(a)
      (a.asset_id, h.phash, captionFor(a.asset_id))
    }

  private def oracleValues: String = oracleRows
    .map { case (id, ph, cap) =>
      s"(CAST($id AS BIGINT), CAST($ph AS BIGINT), '$cap')" }
    .mkString(", ")

  /** Band-OR edge condition over aliases `a`/`b` — the
    * [[ImageDedupOps.phashDedup]] oracle fragment. */
  private def bandMatchSql: String = (0 until ImageDedupOps.NumBands)
    .map(k => s"((a.phash >> ${(ImageDedupOps.NumBands - 1 - k) * 16})" +
      s" & 65535) = " +
      s"((b.phash >> ${(ImageDedupOps.NumBands - 1 - k) * 16}) & 65535)")
    .mkString(" OR ")

  /** 3-gram portable-hash list of a caption column reference — the
    * [[DedupOps.ngramJaccard]] oracle fragment. */
  private def gramsSql(src: String): String =
    s"""grams AS (
       |  SELECT pair_id, list_distinct(list_transform(
       |      generate_series(1, greatest(len(caption) - 2, 1)),
       |      i -> ${DedupOps.pHashSql("caption[i:i+2]")})) AS grams
       |  FROM $src)""".stripMargin

  /** Green-gate query: full pipeline vs a DuckDB mirror of the
    * declared semantics — image band-OR candidates + Hamming verify
    * (the `multimodal_phash_dedup` fragments) AND caption gram-Jaccard
    * (the `dedup_ngram_jaccard` fragments), over driver-recomputed
    * hashes and the literal captions. */
  val pairedDedup: GraftQuery = GraftQuery(
    "multimodal_pair_dedup",
    (s, _) => pairedNearDupPairs(fixtureDf(s)),
    Some {
      s"""WITH h(pair_id, phash, caption) AS (VALUES $oracleValues),
         |${gramsSql("h")},
         |img AS (
         |  SELECT a.pair_id AS id_a, b.pair_id AS id_b,
         |    CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
         |  FROM h a JOIN h b ON a.pair_id < b.pair_id
         |  WHERE bit_count(xor(a.phash, b.phash))
         |      <= ${ImageDedupOps.MaxHamming}
         |    AND ($bandMatchSql))
         |SELECT i.id_a, i.id_b, i.hamming,
         |  CAST(len(list_intersect(ga.grams, gb.grams)) * 10000
         |    // len(list_distinct(ga.grams || gb.grams)) AS BIGINT)
         |    AS caption_jaccard_bp
         |FROM img i
         |JOIN grams ga ON ga.pair_id = i.id_a
         |JOIN grams gb ON gb.pair_id = i.id_b
         |WHERE CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
         |  / len(list_distinct(ga.grams || gb.grams))
         |  >= $CaptionJaccard""".stripMargin
    })

  /** Sample-level near-dup CLUSTERS — keep one witness per component
    * (the operational form, `multimodal_phash_clusters` at pair
    * granularity): the conjunctive edges feed the family's neighbor-min
    * closure; the oracle recomputes it as a recursive CTE over the
    * SAME conjunctive edge set. The planted seeds must cluster as
    * {i, i+1000, i+3000} with i+2000 left OUT — an image-only closure
    * would pull it in, so the query gates the policy, not just the
    * plumbing. */
  val pairedClusters: GraftQuery = GraftQuery(
    "multimodal_pair_clusters",
    (s, _) => CurationOps.connectedComponents(
      pairedNearDupPairs(fixtureDf(s)).select(col("id_a"), col("id_b"))),
    Some {
      s"""WITH RECURSIVE h(pair_id, phash, caption) AS
         |  (VALUES $oracleValues),
         |${gramsSql("h")},
         |img AS (
         |  SELECT a.pair_id AS id_a, b.pair_id AS id_b
         |  FROM h a JOIN h b ON a.pair_id < b.pair_id
         |  WHERE bit_count(xor(a.phash, b.phash))
         |      <= ${ImageDedupOps.MaxHamming}
         |    AND ($bandMatchSql)),
         |edges AS (
         |  SELECT i.id_a AS ia, i.id_b AS ib
         |  FROM img i
         |  JOIN grams ga ON ga.pair_id = i.id_a
         |  JOIN grams gb ON gb.pair_id = i.id_b
         |  WHERE CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
         |    / len(list_distinct(ga.grams || gb.grams))
         |    >= $CaptionJaccard),
         |und AS (SELECT ia AS a, ib AS b FROM edges
         |        UNION SELECT ib, ia FROM edges),
         |reach AS (
         |  SELECT a, b FROM und
         |  UNION
         |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a)
         |SELECT a AS node, least(a, min(b)) AS comp
         |FROM reach GROUP BY a""".stripMargin
    })

  val all: Seq[GraftQuery] = Seq(pairedDedup, pairedClusters)
}
