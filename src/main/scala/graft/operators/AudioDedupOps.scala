package graft.operators

import graft.GraftQuery
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Audio perceptual-fingerprint near-duplicate detection — the last
  * modality of the dedup family (text, embeddings, images are covered;
  * this closes audio), composed from the same ingredients as
  * [[ImageDedupOps]]: a real container decode (javax.sound WAV/PCM, the
  * [[MultimodalOps]] codec), a 64-bit integer fingerprint computed
  * per-partition over the decoded samples, and the banded Hamming
  * bucket join discipline.
  *
  * The fingerprint is the 1-D transposition of the dHash recipe
  * (public perceptual-audio-fingerprint practice per Haitsma & Kalker
  * 2002 — sign bits of band-energy differences — re-shaped onto the
  * integer-exact cell grid the image kernel established):
  *   - decode to centered signed samples (8-bit unsigned → x−128,
  *     16-bit signed LE as-is);
  *   - [[Features]] = 8 integer per-sample functionals: envelope x,
  *     magnitude |x|, first/second/skip absolute differences
  *     (|Δ|, |Δ²|, |x[j]−x[j−2]| — three passbands of activity),
  *     positive and negative slope mass, and slope-sign changes (a
  *     zero-crossing-rate proxy);
  *   - each feature accumulates into [[TimeCells]] = 9 time cells with
  *     EXACT fractional-area weights (sample j covers
  *     [j·T, (j+1)·T) and cell t covers [t·n, (t+1)·n) in n·T-scaled
  *     units, so every overlap is an exact integer — the image
  *     kernel's lesson: truncated cell boundaries alone pushed a
  *     planted resize several Hamming bits away);
  *   - bit (f, t) = [cell(t+1) mean > cell(t) mean], evaluated
  *     CROSS-MULTIPLIED (s₁·a₀ > s₀·a₁) — 8 features × 8 adjacent
  *     comparisons = 64 bits.
  *
  * Exact invariances (the planted-variant arguments, each spec-pinned):
  *   - lossless container re-encode: identical samples ⇒ identical
  *     fingerprint (d = 0);
  *   - integer gain g > 0 (e.g. ×2): features 1–7 are degree-1
  *     homogeneous in the samples, so both sides of every
  *     cross-multiplied comparison scale by the same g and no bit can
  *     flip; the slope-sign-change row compares products of SIGNS,
  *     invariant outright (d = 0, exactly — the brightness-shift
  *     analogue);
  *   - mild resample (90% nearest-neighbor decimation): time cells are
  *     RELATIVE positions of the clip, so each cell sees the same
  *     signal content and every feature scales near-uniformly across
  *     cells; bits flip only where adjacent cells nearly tie — the
  *     recall spec pins d ≤ [[MaxHamming]] per planted seed.
  *
  * Overflow audit (the no-truncating-division rule needs the
  * cross-multiplication exact): |feature| ≤ 4·2¹⁵ = 2¹⁷ per sample
  * (|Δ²| of full-range 16-bit), per-sample weight ≤ T = 9, cell area
  * = n exactly, so |cell sum| ≤ 2¹⁷·2¹⁹ = 2³⁶ and the cross product
  * ≤ 2³⁶·2¹⁹ = 2⁵⁵ < 2⁶³ under the guarded n ≤ 2¹⁹ samples (~65 s at
  * 8 kHz; longer material is fingerprinted per chunk upstream).
  *
  * Pair generation, candidate completeness (pigeonhole at Hamming ≤
  * [[NumBands]] − 1), skew cap, and the VALUES oracle mirroring the
  * band-OR condition are all inherited verbatim from the
  * [[ImageDedupOps]] shape — see that object's doc; at 100 TB nothing
  * is all-pairs and no payload byte crosses a shuffle boundary.
  *
  * Reference scope note: core-etl (the reference, a chain-ETL daemon)
  * has no audio operators; this is beyond-reference engine surface per
  * the training-data-pipeline mandate, following public
  * audio-fingerprinting practice.
  */
object AudioDedupOps {

  final case class AudioAsset(asset_id: Long, payload: Array[Byte])
  final case class AudioFp(asset_id: Long, afp: Long)

  /** Time cells per feature row: 9 cells → 8 adjacent comparisons. */
  val TimeCells = 9

  /** Feature rows (8 × 8 comparisons = 64 bits). */
  val Features = 8

  /** Near-dup Hamming threshold. Candidate generation is provably
    * complete up to [[NumBands]] − 1 = 3; 4..[[MaxHamming]] rides the
    * band-OR condition. Measured on the fixture corpus (pinned in
    * AudioDedupSpec): planted re-encode and ×2 gain at exactly 0,
    * 90% resample within this budget, closest non-duplicate base pair
    * well above it. */
  val MaxHamming = 6

  /** 64-bit fingerprint split into 4 exact-match bands of 16 bits. */
  val NumBands = 4

  /** How many base clips get planted near-dup variants. */
  val DupSeeds = 8

  /** Corpus size (base clips; variants land on ids +1000/+2000/+3000). */
  val NumClips = 32

  /** Per-clip sample-count guard for the overflow audit above. */
  val MaxSamples = 1 << 19

  // -------------------------------------------------------------------
  // Deterministic natural-ish audio corpus
  // -------------------------------------------------------------------
  // Like the image dedup fixture: the [[MultimodalOps]] sawtooth clips
  // are full-spectrum noise, and no perceptual fingerprint is
  // resample-stable on noise. Real audio is a slow envelope carrying
  // band-limited texture, so this corpus renders exactly that, all in
  // integer arithmetic: a per-asset 9-point random lattice linearly
  // interpolated (8.8 fixed point) as the envelope, plus a per-asset
  // square-wave texture (period ≥ 8 samples — survives 90% decimation)
  // that feeds the difference/zero-crossing feature rows. Amplitudes
  // stay within ±2¹³ so the planted ×2 gain never clips 16-bit.

  /** Envelope lattice resolution. */
  val GridN = 9

  private def gridVal(i: Long, g: Int): Int =
    (((((i + 1L) * 2654435761L) ^ (g.toLong * 40503L)) & 0x7fffffffL)
      % 12001L).toInt - 6000

  /** Texture-amplitude lattice in [100, 500]: a second independent
    * envelope modulating the square texture, so the difference-feature
    * rows (|Δ| sums track texture amplitude) carry per-cell per-asset
    * randomness — with a CONSTANT amplitude, two assets sharing a
    * texture period (13 distinct periods over 32 clips) correlated on
    * half the fingerprint rows and the closest non-dup pair measured
    * at Hamming 7; lattice-modulated, it measures 15. */
  private def gridVal2(i: Long, g: Int): Int =
    (((((i + 101L) * 1099087573L) ^ (g.toLong * 95189L)) & 0x7fffffffL)
      % 401L).toInt + 100

  /** Deterministic sample j of asset i's n-sample render: integer
    * bilinear envelope + amplitude-modulated square texture,
    * |value| ≤ 6000 + 500 < 2¹³ (headroom: the planted ×2 gain never
    * clips 16-bit). */
  private[graft] def sampleVal(i: Long, j: Int, n: Int): Int = {
    val u = if (n <= 1) 0 else j * (GridN - 1) * 256 / (n - 1)
    val c0 = math.min(u >> 8, GridN - 2)
    val f = if ((u >> 8) >= GridN - 1) 256 else u & 255
    val env = (gridVal(i, c0) * (256 - f) + gridVal(i, c0 + 1) * f) >> 8
    val aEnv = (gridVal2(i, c0) * (256 - f) + gridVal2(i, c0 + 1) * f) >> 8
    val period = 8 + (i % 13L).toInt
    val tex = if (((j / period) & 1) == 0) aEnv else -aEnv
    env + tex
  }

  /** 16-bit signed little-endian WAV container for `samples` via the
    * real javax.sound writer. */
  private[graft] def wav16(samples: Array[Int], rate: Int): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    var j = 0
    while (j < samples.length) {
      bytes(2 * j) = (samples(j) & 0xff).toByte
      bytes(2 * j + 1) = ((samples(j) >> 8) & 0xff).toByte
      j += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      rate.toFloat, 16, 1, 2, rate.toFloat, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** The container re-encode transform: the SAME samples in a
    * different (still spec-valid) container — a trailing JUNK chunk
    * with the RIFF size patched. The decoder reads the data chunk by
    * its declared size, so decoded samples are byte-identical while
    * the container bytes differ (the image family's "recompressed
    * variant is a genuinely different container" discipline). */
  private[graft] def withJunkChunk(wavBytes: Array[Byte]): Array[Byte] = {
    val junk = Array[Byte]('J', 'U', 'N', 'K', 8, 0, 0, 0,
      0x5a, 0x5a, 0x5a, 0x5a, 0x5a, 0x5a, 0x5a, 0x5a)
    val out = wavBytes ++ junk
    val riffSize = ((wavBytes(4) & 0xff) | ((wavBytes(5) & 0xff) << 8) |
      ((wavBytes(6) & 0xff) << 16) | ((wavBytes(7) & 0xff) << 24)) +
      junk.length
    out(4) = (riffSize & 0xff).toByte
    out(5) = ((riffSize >> 8) & 0xff).toByte
    out(6) = ((riffSize >> 16) & 0xff).toByte
    out(7) = ((riffSize >> 24) & 0xff).toByte
    out
  }

  /** 90% nearest-neighbor decimation (exact integer index map
    * j ↦ ⌊j·n/m⌋ — relative clip position preserved, the audio
    * analogue of the image fixture's nnResize). */
  private[graft] def decimate(samples: Array[Int]): Array[Int] = {
    val n = samples.length
    val m = math.max(1, n * 9 / 10)
    Array.tabulate(m)(j => samples((j.toLong * n / m).toInt))
  }

  private def baseSamples(i: Long): Array[Int] = {
    val n = 2000 + ((i * 173L) % 1200L).toInt
    Array.tabulate(n)(j => sampleVal(i, j, n))
  }

  private def rateOf(i: Long): Int = 8000 + 100 * (i % 40L).toInt

  /** Deterministic corpus of real WAV containers: [[NumClips]] base
    * clips; ids +1000 = container re-encode (d = 0), +2000 = exact ×2
    * gain (d = 0), +3000 = 90% decimation (d ≤ [[MaxHamming]],
    * spec-pinned) of the first [[DupSeeds]] bases. */
  def audioAssets(n: Int): Seq[AudioAsset] = {
    val base = (0 until n).map { i =>
      AudioAsset(i.toLong, wav16(baseSamples(i.toLong), rateOf(i.toLong)))
    }
    val variants = (0 until math.min(DupSeeds, n)).flatMap { i =>
      val s = baseSamples(i.toLong)
      val rate = rateOf(i.toLong)
      Seq(
        AudioAsset(i + 1000L, withJunkChunk(base(i).payload)),
        AudioAsset(i + 2000L, wav16(s.map(_ * 2), rate)),
        AudioAsset(i + 3000L, wav16(decimate(s), rate * 9 / 10)))
    }
    base ++ variants
  }

  // -------------------------------------------------------------------
  // The fingerprint kernel
  // -------------------------------------------------------------------

  /** Decode a WAV payload to centered signed samples via the real
    * javax.sound codec: 16-bit signed LE as-is, 8-bit unsigned
    * centered at 0; multi-channel material uses channel 0 (dedup wants
    * one deterministic view, not a mixdown policy). */
  def pcmSamples(payload: Array[Byte]): Array[Int] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val fmt = ais.getFormat
      val bytes = ais.readAllBytes()
      val frame = fmt.getFrameSize
      val bits = fmt.getSampleSizeInBits
      val nFrames = bytes.length / frame
      require(bits == 8 || bits == 16,
        s"pcmSamples supports 8/16-bit PCM, got $bits-bit")
      Array.tabulate(nFrames) { j =>
        val o = j * frame
        if (bits == 8) (bytes(o) & 0xff) - 128
        else if (fmt.isBigEndian)
          ((bytes(o) << 8) | (bytes(o + 1) & 0xff)).toShort.toInt
        else ((bytes(o + 1) << 8) | (bytes(o) & 0xff)).toShort.toInt
      }
    } finally ais.close()
  }

  /** 64-bit audio fingerprint — see the object doc for the feature
    * rows, exact-area cells, and invariance arguments. */
  def afp64(samples: Array[Int]): Long = {
    val n = samples.length
    require(n >= 32, s"afp64 needs at least 32 samples, got $n")
    require(n <= MaxSamples,
      s"afp64 overflow guard: $n samples exceeds $MaxSamples — " +
        "fingerprint longer material per chunk")
    val t = TimeCells
    // per-sample feature values; rows 0..6 are degree-1 homogeneous in
    // the samples, row 7 is scale-invariant outright
    def feat(f: Int, j: Int): Long = {
      val x = samples(j).toLong
      f match {
        case 0 => x
        case 1 => math.abs(x)
        case 2 => if (j >= 1) math.abs(x - samples(j - 1)) else 0L
        case 3 => if (j >= 2)
          math.abs(x - 2L * samples(j - 1) + samples(j - 2)) else 0L
        case 4 => if (j >= 2) math.abs(x - samples(j - 2)) else 0L
        case 5 => if (j >= 1) math.max(x - samples(j - 1), 0L) else 0L
        case 6 => if (j >= 1) math.max(samples(j - 1).toLong - x, 0L) else 0L
        case _ => if (j >= 2 &&
          (x - samples(j - 1)) * (samples(j - 1).toLong - samples(j - 2)) < 0)
          1L else 0L
      }
    }
    val sums = Array.ofDim[Long](Features, t)
    var j = 0
    while (j < n) {
      // sample j covers [j·t, (j+1)·t) in n·t-scaled units; cell c
      // covers [c·n, (c+1)·n) — exact integer overlaps, total weight t
      val lo = j.toLong * t
      val hi = lo + t
      var c = (lo / n).toInt
      val cEnd = math.min(t - 1, ((hi - 1) / n).toInt)
      while (c <= cEnd) {
        val ov = math.min(hi, (c + 1).toLong * n) - math.max(lo, c.toLong * n)
        var f = 0
        while (f < Features) {
          sums(f)(c) += feat(f, j) * ov
          f += 1
        }
        c += 1
      }
      j += 1
    }
    // cell area is n exactly for every cell (cell width n in scaled
    // units), so the cross-multiplication reduces to a direct sum
    // compare — kept in cross-multiplied FORM so the kernel stays
    // exact if the grid ever becomes non-uniform
    var bits = 0L
    var f = 0
    while (f < Features) {
      var c = 0
      while (c < t - 1) {
        val gt = sums(f)(c + 1) * n.toLong > sums(f)(c) * n.toLong
        bits = (bits << 1) | (if (gt) 1L else 0L)
        c += 1
      }
      f += 1
    }
    bits
  }

  /** Distributed synthetic audio corpus for the scale sweeps: `n`
    * deterministic clips, WAV-encoded where the rows live
    * (per-partition, the [[ImageDedupOps.syntheticImageFrame]]
    * discipline). */
  def syntheticAudioFrame(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(0L, n, 1L, 32).as[Long].mapPartitions(_.map { i =>
      AudioAsset(i, wav16(baseSamples(i), rateOf(i)))
    }).toDF()
  }

  /** Decode + fingerprint one asset. */
  def fingerprintAsset(a: AudioAsset): AudioFp =
    AudioFp(a.asset_id, afp64(pcmSamples(a.payload)))

  /** Distributed decode+fingerprint over a BINARY audio frame
    * (asset_id, payload): 16-byte rows out, per partition — the codec
    * runs where the bytes live and only fingerprints ever shuffle.
    * Undecodable payloads (corrupt/unknown containers, clips shorter
    * than 32 samples or beyond the [[MaxSamples]] guard, unsupported
    * bit depths, null bytes) are DROPPED deterministically — the
    * [[ImageDedupOps.imageHashRows]] policy and rationale: one corrupt
    * file must not kill the job, and an unverifiable asset fails
    * curation (the streaming gate never accepts what it cannot hash). */
  def audioHashRows(audio: DataFrame): DataFrame = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.select(col("asset_id"), col("payload")).as[AudioAsset]
      .mapPartitions(_.flatMap(a =>
        scala.util.Try(fingerprintAsset(a)).toOption))
      .toDF()
  }

  /** The 4×16-bit band explode of an (asset_id, afp) frame — shared by
    * the batch pair query and the at-rest `afp` index layout. */
  def afpBandRows(fps: DataFrame): DataFrame =
    fps.select(col("asset_id"), col("afp"),
      explode(expr(s"sequence(0, ${NumBands - 1})")).as("band"))
      .withColumn("band_key", expr(
        s"shiftrightunsigned(afp, (${NumBands - 1} - band) * 16) & 65535"))

  /** Fingerprint the fixture corpus. */
  def audioFingerprints(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    audioHashRows(audioAssets(n).toDF())
  }

  /** Near-dup pairs at Hamming ≤ [[MaxHamming]] from an (asset_id, afp)
    * frame: band explode, capped candidate join (one keyed exchange),
    * codegen'd bit_count verify — [[ImageDedupOps.phashNearDupPairs]]
    * applied to the audio fingerprint. */
  def afpNearDupPairs(fps: DataFrame): DataFrame = {
    val capped = DedupOps.capBuckets(afpBandRows(fps),
      Seq("band", "band_key"), DedupOps.MaxBucketSize)
    val a = capped.select(col("asset_id").as("id_a"),
      col("afp").as("h_a"), col("band"), col("band_key"))
    val b = capped.select(col("asset_id").as("id_b"),
      col("afp").as("h_b"), col("band"), col("band_key"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("h_a"), col("h_b"))
      .distinct() // a pair may meet in up to 4 bands; report it once
      .withColumn("hamming",
        expr("CAST(bit_count(h_a ^ h_b) AS INT)"))
      .filter(col("hamming") <= MaxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Driver-side fingerprints for the oracle — same code path as the
    * engine (the multimodal-family VALUES-oracle convention). */
  private lazy val oracleFps: Seq[AudioFp] =
    audioAssets(NumClips).map(fingerprintAsset)

  /** Green-gate query: decode → fingerprint → banded join vs a DuckDB
    * mirror of the DECLARED semantics (band-OR candidate + Hamming
    * verify — the [[ImageDedupOps.phashDedup]] oracle shape). */
  val audioDedup: GraftQuery = GraftQuery(
    "multimodal_audio_dedup",
    (s, _) => afpNearDupPairs(audioFingerprints(s, NumClips)),
    Some {
      val rows = oracleFps
        .map(x => s"(CAST(${x.asset_id} AS BIGINT), " +
          s"CAST(${x.afp} AS BIGINT))")
        .mkString(", ")
      val bandMatch = (0 until NumBands)
        .map(k => s"((a.afp >> ${(NumBands - 1 - k) * 16}) & 65535) = " +
          s"((b.afp >> ${(NumBands - 1 - k) * 16}) & 65535)")
        .mkString(" OR ")
      s"""WITH h(asset_id, afp) AS (VALUES $rows)
         |SELECT a.asset_id AS id_a, b.asset_id AS id_b,
         |  CAST(bit_count(xor(a.afp, b.afp)) AS INTEGER) AS hamming
         |FROM h a JOIN h b ON a.asset_id < b.asset_id
         |WHERE bit_count(xor(a.afp, b.afp)) <= $MaxHamming
         |  AND ($bandMatch)"""
        .stripMargin
    })

  /** Near-dup clusters over the audio pair report — the
    * [[ImageDedupOps.phashClusters]] shape for the audio modality:
    * banded pairs → neighbor-min closure, recursive-CTE oracle over
    * the identical band-OR edge set. */
  val audioClusters: GraftQuery = GraftQuery(
    "multimodal_audio_clusters",
    (s, _) => CurationOps.connectedComponents(
      afpNearDupPairs(audioFingerprints(s, NumClips))
        .select(col("id_a"), col("id_b"))),
    Some {
      val rows = oracleFps
        .map(x => s"(CAST(${x.asset_id} AS BIGINT), " +
          s"CAST(${x.afp} AS BIGINT))")
        .mkString(", ")
      val bandMatch = (0 until NumBands)
        .map(k => s"((a.afp >> ${(NumBands - 1 - k) * 16}) & 65535) = " +
          s"((b.afp >> ${(NumBands - 1 - k) * 16}) & 65535)")
        .mkString(" OR ")
      s"""WITH RECURSIVE h(asset_id, afp) AS (VALUES $rows),
         |edges AS (
         |  SELECT a.asset_id AS ia, b.asset_id AS ib
         |  FROM h a JOIN h b ON a.asset_id < b.asset_id
         |  WHERE bit_count(xor(a.afp, b.afp)) <= $MaxHamming
         |    AND ($bandMatch)),
         |und AS (SELECT ia AS a, ib AS b FROM edges
         |        UNION SELECT ib, ia FROM edges),
         |reach AS (
         |  SELECT a, b FROM und
         |  UNION
         |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a)
         |SELECT a AS node, least(a, min(b)) AS comp
         |FROM reach GROUP BY a"""
        .stripMargin
    })

  val all: Seq[GraftQuery] = Seq(audioDedup, audioClusters)
}
