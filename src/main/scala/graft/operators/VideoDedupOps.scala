package graft.operators

import graft.GraftQuery
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Video near-duplicate detection over PRE-EXTRACTED frames — the last
  * cell of the modality matrix, built by transposing the chunked-audio
  * shape onto the image kernel: a video is to its frames what a long
  * audio clip is to its chunks, so the per-unit fingerprint is
  * [[ImageDedupOps.dhash64]] per frame and the asset-level verdict is
  * the same majority-coverage aggregation
  * ([[AudioDedupOps.afpNearDupPairs]]).
  *
  * Input model — the codec boundary, stated honestly: there is no
  * pure-JVM video container decode (H.264/VP9/AV1 need native codecs
  * this engine deliberately does not link), so the operator consumes a
  * frames table `(video_id, frame_idx, payload)` of already-extracted
  * stills (the standard corpus layout: frame sampling happens in the
  * ingest tier that owns the codecs; every hyperscale video dedup
  * pipeline fingerprints sampled frames, not containers). Each frame
  * payload is a real image container ([[MultimodalOps.decodeImage]] —
  * PNG in the fixture), decoded and hashed per partition.
  *
  * Semantics:
  *  - per-frame 64-bit dHash → (video_id, frame_idx, n_frames, phash)
  *    rows, where n_frames counts the video's HASHABLE frames (a
  *    corrupt frame drops from the row set and the denominator alike —
  *    the per-asset drop policy of the image family, applied per
  *    frame so one bad frame never discards a whole video);
  *  - frame-level banded Hamming pairs — 4×16-bit band-OR candidates,
  *    [[DedupOps.MaxBucketSize]]-capped bucket join, codegen'd
  *    bit_count verify at ≤ [[ImageDedupOps.MaxHamming]] — between
  *    frames of DIFFERENT videos (any frame alignment: a trimmed or
  *    re-cut copy matches shifted);
  *  - verdict per video pair iff matched frames cover a MAJORITY of
  *    BOTH videos' frames (2·matched > n_frames each side), reported
  *    hamming = worst matched frame. A single shared still between two
  *    otherwise-different videos is NOT a duplicate verdict.
  *
  * Scale shape: decode+hash where the frame bytes live (payloads never
  * shuffle — the [[ImageDedupOps]] plan discipline), 24-byte hash rows
  * through one window count (n_frames) and one capped band join, then
  * a keyed aggregation over the (small) frame-pair report. At 100 TB
  * of video the frames table is the big input and every exchange after
  * the scan is fingerprint-sized.
  *
  * Reference scope note: core-etl (the reference, a chain-ETL daemon)
  * has no video operators; this is beyond-reference engine surface per
  * the training-data-pipeline mandate, following public practice
  * (frame-sampled perceptual hashing as in standard video copy
  * detection literature).
  */
object VideoDedupOps {

  final case class VideoFrame(video_id: Long, frame_idx: Int,
      payload: Array[Byte])

  /** Frames per fixture video. */
  val FramesPerVideo = 6

  /** Base videos in the fixture corpus. */
  val NumVideos = 10

  /** How many base videos get planted near-dup variants. */
  val DupSeeds = 3

  /** Trimmed-variant length: the first 4 of 6 frames — enough for a
    * majority verdict on both sides (4·2 > 6 and 4·2 > 4). */
  val TrimFrames = 4

  // -------------------------------------------------------------------
  // Deterministic fixture corpus of frame stills
  // -------------------------------------------------------------------
  // Frame content rides the image family's smooth-render generator
  // under a per-(video, frame) content seed with NO relation to the
  // image fixture's seeds (offset 9000), so the two corpora can never
  // accidentally near-match. Frames of one video are mutually distinct
  // renders (different seeds) — a video is a SEQUENCE, not a repeated
  // still — and frame geometry cycles like the image corpus.

  private def frameSeed(video: Long, frame: Int): Long =
    9000L + video * 64L + frame

  private def framePng(video: Long, frame: Int): Array[Byte] = {
    val (w, h) = ImageDedupOps.geometry(((video * 7 + frame) % 35).toInt)
    ImageDedupOps.encodePng(
      ImageDedupOps.renderSmooth(frameSeed(video, frame), w, h, 0))
  }

  /** The fixture corpus: [[NumVideos]] base videos of [[FramesPerVideo]]
    * frames; for seeds 0 until [[DupSeeds]], three planted variants —
    *   +1000: every frame losslessly re-encoded
    *     ([[ImageDedupOps.reencode]] — identical pixels ⇒ d = 0 per
    *     frame, 6/6 matched);
    *   +2000: TRIMMED copy (the first [[TrimFrames]] frames, payloads
    *     byte-identical — the re-cut shape; majority holds both sides);
    *   +3000: every frame 90% nearest-neighbor resized (d small per
    *     frame, spec-pinned ≤ [[ImageDedupOps.MaxHamming]]). */
  def videoFrames(n: Int): Seq[VideoFrame] = {
    val base = for {
      v <- 0 until n; f <- 0 until FramesPerVideo
    } yield VideoFrame(v.toLong, f, framePng(v.toLong, f))
    val variants = (0 until math.min(DupSeeds, n)).flatMap { v =>
      val mine = base.filter(_.video_id == v.toLong)
      mine.map(fr => VideoFrame(v + 1000L, fr.frame_idx,
        ImageDedupOps.reencode(fr.payload))) ++
        mine.filter(_.frame_idx < TrimFrames)
          .map(fr => VideoFrame(v + 2000L, fr.frame_idx, fr.payload)) ++
        mine.map { fr =>
          val img = MultimodalOps.decodeImage(fr.payload)
          VideoFrame(v + 3000L, fr.frame_idx,
            ImageDedupOps.encodePng(ImageDedupOps.nnResize(img,
              img.getWidth * 9 / 10, img.getHeight * 9 / 10)))
        }
    }
    base ++ variants
  }

  // -------------------------------------------------------------------
  // The operator
  // -------------------------------------------------------------------

  /** Distributed decode + per-frame dHash over a frames frame
    * (video_id, frame_idx, payload): (video_id, frame_idx, n_frames,
    * phash) rows out — decode per partition, then ONE narrow keyed
    * window to count each video's hashable frames (the verdict
    * denominator). Undecodable frames drop deterministically from rows
    * AND denominator ([[ImageDedupOps.classifyImage]] policy per
    * frame). */
  def videoHashRows(frames: DataFrame): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    val hashed = frames
      .select(col("video_id"), col("frame_idx"), col("payload"))
      .as[VideoFrame]
      .mapPartitions(_.flatMap(fr =>
        ImageDedupOps.classifyImage(
          ImageDedupOps.ImageAsset(fr.video_id, fr.payload)).toOption
          .map(h => (fr.video_id, fr.frame_idx, h.phash))))
      .toDF("video_id", "frame_idx", "phash")
    hashed.withColumn("n_frames",
      count(lit(1)).over(Window.partitionBy(col("video_id"))).cast("int"))
      .select(col("video_id"), col("frame_idx"), col("n_frames"),
        col("phash"))
  }

  /** The audit twin of [[videoHashRows]]: one (video_id, frame_idx,
    * reason) row per FRAME the hash path drops
    * ([[ImageDedupOps.classifyImage]] reasons — corrupt / too_small /
    * oversized). A video's verdict denominator shrinks by exactly
    * these rows. */
  def videoFrameRejects(frames: DataFrame): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.select(col("video_id"), col("frame_idx"), col("payload"))
      .as[VideoFrame]
      .mapPartitions(_.flatMap(fr =>
        ImageDedupOps.classifyImage(
          ImageDedupOps.ImageAsset(fr.video_id, fr.payload)).left.toOption
          .map(reason => (fr.video_id, fr.frame_idx, reason))))
      .toDF("video_id", "frame_idx", "reason")
  }

  /** 4×16-bit band explode of frame-hash rows — frame_idx/n_frames
    * ride every band row (the [[AudioDedupOps.afpBandRows]] shape). */
  def videoBandRows(rows: DataFrame): DataFrame =
    rows.select(col("video_id"), col("frame_idx"), col("n_frames"),
      col("phash"),
      explode(expr(s"sequence(0, ${ImageDedupOps.NumBands - 1})"))
        .as("band"))
      .withColumn("band_key", expr(
        s"shiftrightunsigned(phash, " +
          s"(${ImageDedupOps.NumBands - 1} - band) * 16) & 65535"))

  /** FRAME-level cross-video near-dup pairs at Hamming ≤
    * [[ImageDedupOps.MaxHamming]]: capped band-bucket join, any frame
    * alignment. Columns: id_a, id_b, f_a, f_b, n_a, n_b, hamming. */
  def videoFramePairs(rows: DataFrame): DataFrame = {
    val capped = DedupOps.capBuckets(videoBandRows(rows),
      Seq("band", "band_key"), DedupOps.MaxBucketSize)
    val a = capped.select(col("video_id").as("id_a"),
      col("frame_idx").as("f_a"), col("n_frames").as("n_a"),
      col("phash").as("h_a"), col("band"), col("band_key"))
    val b = capped.select(col("video_id").as("id_b"),
      col("frame_idx").as("f_b"), col("n_frames").as("n_b"),
      col("phash").as("h_b"), col("band"), col("band_key"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("f_a"), col("f_b"),
        col("n_a"), col("n_b"), col("h_a"), col("h_b"))
      .distinct() // a frame pair may meet in up to 4 bands; once
      .withColumn("hamming",
        expr("CAST(bit_count(h_a ^ h_b) AS INT)"))
      .filter(col("hamming") <= ImageDedupOps.MaxHamming)
  }

  /** VIDEO-level near-dup pairs: majority-coverage aggregation of
    * [[videoFramePairs]] on both sides, hamming = worst matched frame
    * — the [[AudioDedupOps.afpNearDupPairs]] verdict transposed. */
  def videoNearDupPairs(rows: DataFrame): DataFrame =
    videoFramePairs(rows)
      .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(countDistinct(col("f_a")).as("m_a"),
        countDistinct(col("f_b")).as("m_b"),
        max(col("hamming")).as("hamming"))
      .filter(col("m_a") * 2 > col("n_a") && col("m_b") * 2 > col("n_b"))
      .select(col("id_a"), col("id_b"), col("hamming"))

  // -------------------------------------------------------------------
  // Gate/index-facing forms: the at-rest `vhash` kind and the
  // streaming gate address a video as an ASSET (column `asset_id` —
  // the phash/afp at-rest schema), so these wrappers present the same
  // operators over (asset_id, frame_idx, ...) frames. Pure renames; no
  // extra scan or exchange.
  // -------------------------------------------------------------------

  /** [[videoHashRows]] over an (asset_id, frame_idx, payload) frame. */
  def assetHashRows(frames: DataFrame): DataFrame =
    videoHashRows(frames.withColumnRenamed("asset_id", "video_id"))
      .withColumnRenamed("video_id", "asset_id")

  /** [[videoBandRows]] over (asset_id, frame_idx, n_frames, phash). */
  def assetBandRows(rows: DataFrame): DataFrame =
    videoBandRows(rows.withColumnRenamed("asset_id", "video_id"))
      .withColumnRenamed("video_id", "asset_id")

  /** [[videoNearDupPairs]] over (asset_id, frame_idx, n_frames,
    * phash). */
  def assetNearDupPairs(rows: DataFrame): DataFrame =
    videoNearDupPairs(rows.withColumnRenamed("asset_id", "video_id"))

  /** Distributed synthetic frames corpus for the scale sweeps: `n`
    * frames across n/[[FramesPerVideo]] videos, PNG-encoded where the
    * rows live (per-partition — the
    * [[ImageDedupOps.syntheticImageFrame]] discipline). */
  def syntheticVideoFrame(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(0L, n, 1L, 32).as[Long].mapPartitions(_.map { i =>
      val v = i / FramesPerVideo
      val f = (i % FramesPerVideo).toInt
      VideoFrame(v, f, framePng(v, f))
    }).toDF()
  }

  /** Fixture frames as a DataFrame, hashed by the engine path —
    * materialized once (the gate's ONE-decode discipline: the pair
    * self-join and the verdict read 24-byte hash rows, never a second
    * render+decode pass; measured 2.2× at 45k frames). */
  def videoFingerprints(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    videoHashRows(videoFrames(n).toDF()).localCheckpoint()
  }

  /** Driver-side frame hashes for the oracle — same kernel, same
    * denominator semantics (all fixture frames are hashable). */
  private lazy val oracleRows: Seq[(Long, Int, Int, Long)] = {
    val frames = videoFrames(NumVideos)
    val counts = frames.groupBy(_.video_id).view.mapValues(_.size).toMap
    frames.map(fr => (fr.video_id, fr.frame_idx, counts(fr.video_id),
      ImageDedupOps.dhash64(MultimodalOps.decodeImage(fr.payload))))
  }

  private def oracleValuesRows: String = oracleRows
    .map { case (v, f, n, h) =>
      s"(CAST($v AS BIGINT), $f, $n, CAST($h AS BIGINT))"
    }
    .mkString(", ")

  /** The frame-candidate + majority-coverage verdict CTEs mirroring
    * [[videoFramePairs]] → [[videoNearDupPairs]] exactly (the
    * [[AudioDedupOps]] oracle shape at frame granularity). */
  private def oracleCandCtes: String = {
    val nb = ImageDedupOps.NumBands
    val bandMatch = (0 until nb)
      .map(k => s"((a.phash >> ${(nb - 1 - k) * 16}) & 65535) = " +
        s"((b.phash >> ${(nb - 1 - k) * 16}) & 65535)")
      .mkString(" OR ")
    s"""h(video_id, frame_idx, n_frames, phash) AS (VALUES $oracleValuesRows),
       |cand AS (
       |  SELECT a.video_id AS ia, b.video_id AS ib,
       |    a.frame_idx AS fa, b.frame_idx AS fb,
       |    a.n_frames AS na, b.n_frames AS nb,
       |    CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS d
       |  FROM h a JOIN h b ON a.video_id < b.video_id
       |  WHERE bit_count(xor(a.phash, b.phash)) <=
       |    ${ImageDedupOps.MaxHamming}
       |    AND ($bandMatch)),
       |verdicts AS (
       |  SELECT ia, ib, MAX(d) AS hamming
       |  FROM cand GROUP BY ia, ib, na, nb
       |  HAVING COUNT(DISTINCT fa) * 2 > na
       |     AND COUNT(DISTINCT fb) * 2 > nb)""".stripMargin
  }

  /** Green-gate query: frames → per-frame dHash → banded frame join →
    * majority-coverage verdict vs the DuckDB mirror of the declared
    * semantics. */
  val videoDedup: GraftQuery = GraftQuery(
    "multimodal_video_dedup",
    (s, _) => videoNearDupPairs(videoFingerprints(s, NumVideos)),
    Some {
      s"""WITH $oracleCandCtes
         |SELECT ia AS id_a, ib AS id_b, hamming FROM verdicts"""
        .stripMargin
    })

  /** Near-dup clusters over the video verdicts — every planted
    * {base, re-encode, trim, resize} group collapses to one component
    * (the operational keep-one-witness form). */
  val videoClusters: GraftQuery = GraftQuery(
    "multimodal_video_clusters",
    (s, _) => CurationOps.connectedComponents(
      videoNearDupPairs(videoFingerprints(s, NumVideos))
        .select(col("id_a"), col("id_b"))),
    Some {
      s"""WITH RECURSIVE $oracleCandCtes,
         |und AS (SELECT ia AS a, ib AS b FROM verdicts
         |        UNION SELECT ib, ia FROM verdicts),
         |reach AS (
         |  SELECT a, b FROM und
         |  UNION
         |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a)
         |SELECT a AS node, least(a, min(b)) AS comp
         |FROM reach GROUP BY a"""
        .stripMargin
    })

  // -------------------------------------------------------------------
  // Perceptual decontamination — the video member of the family
  // ([[ImageDedupOps.phashContamination]] /
  // [[AudioDedupOps.afpContamination]]): which corpus videos are
  // near-dups of a benchmark video, frame-coverage verdict, benchmark
  // side broadcast.
  // -------------------------------------------------------------------

  /** Corpus-vs-benchmark near-dup report over two frames tables
    * ((video_id, frame_idx, payload) each): (video_id, eval_id,
    * hamming) for every corpus video whose matched frames cover a
    * majority of BOTH itself and a benchmark video. `bench` must be
    * small (it broadcasts). */
  def videoContamination(corpus: DataFrame, bench: DataFrame): DataFrame = {
    val c = videoBandRows(videoHashRows(corpus))
      .select(col("video_id"), col("frame_idx").as("f_a"),
        col("n_frames").as("n_a"), col("phash").as("h_a"),
        col("band"), col("band_key"))
    val b = videoBandRows(videoHashRows(bench))
      .select(col("video_id").as("eval_id"), col("frame_idx").as("f_b"),
        col("n_frames").as("n_b"), col("phash").as("h_b"),
        col("band"), col("band_key"))
    c.join(broadcast(b), Seq("band", "band_key"))
      .select(col("video_id"), col("eval_id"), col("f_a"), col("f_b"),
        col("n_a"), col("n_b"), col("h_a"), col("h_b"))
      .distinct() // a frame pair may meet in up to 4 bands; once
      .withColumn("hamming", expr("CAST(bit_count(h_a ^ h_b) AS INT)"))
      .filter(col("hamming") <= ImageDedupOps.MaxHamming)
      .groupBy(col("video_id"), col("eval_id"), col("n_a"), col("n_b"))
      .agg(countDistinct(col("f_a")).as("m_a"),
        countDistinct(col("f_b")).as("m_b"),
        max(col("hamming")).as("hamming"))
      .filter(col("m_a") * 2 > col("n_a") && col("m_b") * 2 > col("n_b"))
      .select(col("video_id"), col("eval_id"), col("hamming"))
  }

  /** Deterministic benchmark fixture: the re-encoded frames of corpus
    * video 0 under eval id 9000, the TRIMMED copy of video 1 under
    * 9001 (majority holds both sides — a re-cut benchmark still
    * flags), and a fresh 6-frame video (unseen content seeds) that
    * must NOT flag. */
  private def benchFrames: Seq[VideoFrame] = {
    val base = videoFrames(NumVideos)
    base.filter(_.video_id == 0L).map(fr => VideoFrame(9000L,
      fr.frame_idx, ImageDedupOps.reencode(fr.payload))) ++
      base.filter(f => f.video_id == 1L && f.frame_idx < TrimFrames)
        .map(fr => VideoFrame(9001L, fr.frame_idx, fr.payload)) ++
      (0 until FramesPerVideo).map(f => VideoFrame(9100L, f,
        ImageDedupOps.encodePng(ImageDedupOps.renderSmooth(
          66000L + f, 112, 96, 0))))
  }

  private lazy val oracleBenchRows: Seq[(Long, Int, Int, Long)] = {
    val counts = benchFrames.groupBy(_.video_id).view.mapValues(_.size)
      .toMap
    benchFrames.map(fr => (fr.video_id, fr.frame_idx,
      counts(fr.video_id),
      ImageDedupOps.dhash64(MultimodalOps.decodeImage(fr.payload))))
  }

  /** Green-gate query: the re-encoded benchmark flags video 0 (all
    * frames d = 0), the trimmed benchmark flags video 1 (4 of 6 —
    * majority both sides), the fresh one flags nothing. Oracle mirrors
    * the band-OR + Hamming + coverage aggregation over both
    * frame-hash sets. */
  val videoDecontaminate: GraftQuery = GraftQuery(
    "multimodal_video_decontaminate",
    (s, _) => {
      import s.implicits._
      videoContamination(videoFrames(NumVideos)
        .filter(_.video_id < NumVideos).toDF(), benchFrames.toDF())
    },
    Some {
      val nb = ImageDedupOps.NumBands
      val corpusRows = oracleRows
        .filter(_._1 < NumVideos)
        .map { case (v, f, n, h) =>
          s"(CAST($v AS BIGINT), $f, $n, CAST($h AS BIGINT))"
        }
        .mkString(", ")
      val benchRows = oracleBenchRows
        .map { case (v, f, n, h) =>
          s"(CAST($v AS BIGINT), $f, $n, CAST($h AS BIGINT))"
        }
        .mkString(", ")
      val bandMatch = (0 until nb)
        .map(k => s"((c.phash >> ${(nb - 1 - k) * 16}) & 65535) = " +
          s"((b.phash >> ${(nb - 1 - k) * 16}) & 65535)")
        .mkString(" OR ")
      s"""WITH c(video_id, frame_idx, n_frames, phash) AS
         |  (VALUES $corpusRows),
         |b(eval_id, frame_idx, n_frames, phash) AS (VALUES $benchRows),
         |cand AS (
         |  SELECT c.video_id, b.eval_id,
         |    c.frame_idx AS fa, b.frame_idx AS fb,
         |    c.n_frames AS na, b.n_frames AS nb,
         |    CAST(bit_count(xor(c.phash, b.phash)) AS INTEGER) AS d
         |  FROM c JOIN b
         |    ON bit_count(xor(c.phash, b.phash)) <=
         |      ${ImageDedupOps.MaxHamming}
         |    AND ($bandMatch))
         |SELECT video_id, eval_id, MAX(d) AS hamming
         |FROM cand GROUP BY video_id, eval_id, na, nb
         |HAVING COUNT(DISTINCT fa) * 2 > na
         |   AND COUNT(DISTINCT fb) * 2 > nb"""
        .stripMargin
    })

  val all: Seq[GraftQuery] =
    Seq(videoDedup, videoClusters, videoDecontaminate)
}
