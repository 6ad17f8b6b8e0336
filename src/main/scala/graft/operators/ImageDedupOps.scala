package graft.operators

import graft.GraftQuery
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Image perceptual-hash near-duplicate detection — the LAION-style
  * image dedup pass every multimodal corpus build runs, composed from
  * ingredients the engine already owns: the real `javax.imageio` PNG
  * decode ([[MultimodalOps.decodeImage]]), a 64-bit difference hash
  * (dHash) computed per-partition over the decoded pixels, and the
  * banded Hamming bucket join discipline of the text/embedding dedup
  * family ([[DedupOps]] band buckets + skew cap).
  *
  * The hash is INTEGER END-TO-END (the round-13 rule: no computed
  * double anywhere near a hash-gated value):
  *   - luma = (299·r + 587·g + 114·b) / 1000 — integer Rec.601 weights,
  *     truncating division;
  *   - box-downsample to a 9×8 grid of cell sums (exact integer
  *     boundaries cx·w/9, cy·h/8 — the area-average low-pass that gives
  *     the hash its robustness to resize/recompress);
  *   - bit (cy, cx) = [mean(cy, cx+1) > mean(cy, cx)], evaluated as the
  *     CROSS-MULTIPLIED s₁·n₀ > s₀·n₁ so unequal cell populations (w, h
  *     not divisible by 9, 8) never pass through a truncating mean —
  *     8 rows × 8 horizontal comparisons = 64 bits.
  * Gradient-sign structure makes the hash exactly invariant to global
  * brightness shift (every cell sum moves by shift·n, cancelling in the
  * cross-multiplication) and to lossless re-encoding (pixels identical),
  * and stable under mild resize (box means of a smooth image shift by
  * O(sampling), flipping a bit only where adjacent cells nearly tie).
  *
  * Pair generation is the [[DedupOps]] banding discipline (multi-index
  * Hamming search): a pair is a candidate iff it agrees EXACTLY on at
  * least one of 4 × 16-bit bands, then `bit_count(xor)` ≤ [[MaxHamming]]
  * verifies. By pigeonhole the candidate step is provably complete for
  * pairs at Hamming ≤ [[NumBands]] − 1 = 3 (3 differing bits cannot
  * touch all 4 bands); pairs in the 4..[[MaxHamming]] zone are found
  * when their flips leave one band untouched — the standard multi-index
  * residual trade, deterministic per corpus, and the planted-recall
  * spec (ImageDedupSpec) pins that every planted transform IS detected.
  * The oracle mirrors the band-OR candidate condition in SQL (the
  * `dedup_minhash_lsh` precedent), so the correctness gate is exact
  * over the declared semantics, not a weaker subset claim.
  * Scale shape: one decode+hash scan (codec per partition, binary
  * payloads never shuffle), a 4× band explode of 16-byte rows, ONE keyed
  * exchange for the candidate join with the family's
  * [[DedupOps.MaxBucketSize]] cap bounding degenerate keys (flat-color
  * images all share band value 0 — the boilerplate analogue), and a
  * codegen'd `bit_count(xor)` verify. At 100 TB nothing is all-pairs and
  * no pixel data crosses a shuffle boundary.
  *
  * Reference scope note: core-etl (the reference, a chain-ETL daemon)
  * has no image operators; this is beyond-reference engine surface per
  * the training-data-pipeline mandate, following public perceptual-hash
  * practice (dHash as popularized by Krawetz; banding per standard
  * multi-index Hamming search).
  */
object ImageDedupOps {

  final case class ImageAsset(asset_id: Long, payload: Array[Byte])
  final case class ImageHash(asset_id: Long, phash: Long)

  /** One audited drop from a perceptual hash path: which asset and WHY
    * — shared by [[imageRejects]] and
    * [[AudioDedupOps.audioRejects]]. */
  final case class AssetReject(asset_id: Long, reason: String)

  /** Typed reject signal for the classify* audit paths: the decode/hash
    * guards throw this with the audit `reason` class attached, so
    * [[classifyImage]] / [[AudioDedupOps.classifyAudio]] dispatch on the
    * exception TYPE instead of sniffing require-message substrings — a
    * reworded guard message can no longer silently reclassify an audit
    * reason to `corrupt`. Extends IllegalArgumentException so callers
    * that treat a guard failure as an argument error keep working. */
  final class UnhashableAssetException(val reason: String, detail: String)
      extends IllegalArgumentException(detail)

  /** dHash grid: 9 columns of cell means → 8 horizontal comparisons per
    * row × 8 rows = 64 bits. */
  val HashW = 9
  val HashH = 8

  /** Near-dup Hamming threshold. Candidate generation is provably
    * complete up to [[NumBands]] − 1 = 3 (pigeonhole); 4..6 rides the
    * band-OR condition (see object doc). Measured on the fixture
    * corpus: planted 90%-resize copies land at Hamming 0..4, the
    * closest non-duplicate base pair at 11 — the threshold sits in the
    * gap with margin on both sides. */
  val MaxHamming = 6

  /** 64-bit hash split into 4 exact-match bands of 16 bits. */
  val NumBands = 4

  /** How many base images get planted near-dup variants. */
  val DupSeeds = 8

  /** Corpus size (base images; variants land on ids +1000/+2000/+3000). */
  val NumImages = 32

  // -------------------------------------------------------------------
  // Deterministic smooth image corpus
  // -------------------------------------------------------------------
  // The [[MultimodalOps]] fixture images are per-pixel sawtooth patterns
  // (full-spectrum by construction) — ideal for checksum plumbing, but
  // no perceptual hash is resize-stable on white noise, and a planted
  // "slightly resized copy" must actually be NEAR its source. Real
  // photographs are overwhelmingly low-frequency, so this corpus renders
  // smooth images: integer bilinear interpolation of a per-asset 5×5
  // random lattice. All arithmetic is integer (8.8 fixed point), so
  // every pixel — and therefore every hash — is reproducible driver-side
  // for the oracle, exactly like the other multimodal fixtures.

  /** Lattice resolution of the smooth corpus. */
  val GridN = 5

  /** Deterministic lattice value in [8, 247]: headroom so the planted
    * +4 brightness variant never clamps at 255 (clamping would break the
    * exact shift-invariance argument). */
  private def gridVal(i: Long, gx: Int, gy: Int): Int =
    ((((i + 1L) * 73856093L) ^ (gx.toLong * 19349663L) ^
      (gy.toLong * 83492791L)) & 0x7fffffffL).toInt % 240 + 8

  /** Integer bilinear sample of asset `i`'s lattice at pixel (x, y) of a
    * w×h render, plus a flat brightness offset. 8.8 fixed point; the
    * final >> 16 is the only (exact) rescale. */
  private[graft] def smoothGray(i: Long, w: Int, h: Int, x: Int, y: Int,
      bright: Int): Int = {
    def axis(p: Int, n: Int): (Int, Int) = {
      val u = if (n <= 1) 0 else p * (GridN - 1) * 256 / (n - 1)
      val c = u >> 8
      if (c >= GridN - 1) (GridN - 2, 256) else (c, u & 255)
    }
    val (cx, fx) = axis(x, w)
    val (cy, fy) = axis(y, h)
    val v00 = gridVal(i, cx, cy)
    val v10 = gridVal(i, cx + 1, cy)
    val v01 = gridVal(i, cx, cy + 1)
    val v11 = gridVal(i, cx + 1, cy + 1)
    ((v00 * (256 - fx) * (256 - fy) + v10 * fx * (256 - fy) +
      v01 * (256 - fx) * fy + v11 * fx * fy) >> 16) + bright
  }

  private[graft] def renderSmooth(i: Long, w: Int, h: Int,
      bright: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = smoothGray(i, w, h, x, y, bright)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    img
  }

  private[graft] def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Nearest-neighbor resize of DECODED pixels — the
    * [[MultimodalOps.resizeImage]] integer kernel, kept as an image so
    * the result re-encodes as a genuinely transformed container. */
  private[graft] def nnResize(src: java.awt.image.BufferedImage, tw: Int,
      th: Int): java.awt.image.BufferedImage = {
    val (sw, sh) = (src.getWidth, src.getHeight)
    val out = new java.awt.image.BufferedImage(
      tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < th) {
      val sy = y * sh / th
      var x = 0
      while (x < tw) { out.setRGB(x, y, src.getRGB(x * sw / tw, sy)); x += 1 }
      y += 1
    }
    out
  }

  /** Lossless "downloaded twice through different pipelines" copy:
    * decode → re-encode, then splice a `tEXt` ancillary chunk (spec'd
    * PNG metadata, ignored by every decoder) before IEND — the
    * container BYTES are guaranteed different, the decoded pixels are
    * bit-identical. Chunk framing is the public PNG layout: 4-byte
    * big-endian length, 4-byte type, data, CRC32 over type+data. */
  private[graft] def reencode(payload: Array[Byte]): Array[Byte] = {
    val clean = encodePng(MultimodalOps.decodeImage(payload))
    val data = "Comment\u0000recompressed".getBytes("ISO-8859-1")
    val chunk = java.nio.ByteBuffer.allocate(12 + data.length)
    chunk.putInt(data.length).put("tEXt".getBytes("ISO-8859-1")).put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(chunk.array(), 4, 4 + data.length)
    chunk.putInt(crc.getValue.toInt)
    // IEND is the final 12 bytes of a well-formed PNG stream
    val cut = clean.length - 12
    clean.take(cut) ++ chunk.array() ++ clean.drop(cut)
  }

  private[graft] def geometry(i: Int): (Int, Int) =
    (96 + (i % 5) * 16, 80 + (i % 7) * 16)

  /** The dedup fixture corpus: `n` smooth base images plus, for seeds
    * 0 until [[DupSeeds]], three planted near-duplicate transforms —
    *   +1000: losslessly recompressed copy (identical pixels ⇒ d = 0);
    *   +2000: +4 brightness re-render (exact hash invariance ⇒ d = 0);
    *   +3000: 90% nearest-neighbor resize of the decoded pixels
    *          (box means shift slightly ⇒ d small; the recall spec pins
    *          d ≤ [[MaxHamming]] per seed). */
  def imageAssets(n: Int): Seq[ImageAsset] = {
    val base = (0 until n).map { i =>
      val (w, h) = geometry(i)
      ImageAsset(i.toLong, encodePng(renderSmooth(i.toLong, w, h, 0)))
    }
    val variants = (0 until math.min(DupSeeds, n)).flatMap { i =>
      val (w, h) = geometry(i)
      val orig = base(i).payload
      Seq(
        ImageAsset(i + 1000L, reencode(orig)),
        ImageAsset(i + 2000L, encodePng(renderSmooth(i.toLong, w, h, 4))),
        ImageAsset(i + 3000L, encodePng(nnResize(
          MultimodalOps.decodeImage(orig), w * 9 / 10, h * 9 / 10))))
    }
    base ++ variants
  }

  // -------------------------------------------------------------------
  // The hash kernel
  // -------------------------------------------------------------------

  /** 64-bit dHash over decoded pixels — see the object doc for the
    * integer-exactness and invariance arguments.
    *
    * Cell means use EXACT FRACTIONAL-AREA weights, not integer pixel
    * boundaries: on the axis scaled by HashW (resp. HashH), pixel x
    * covers [x·HashW, x·HashW + HashW) and cell cx covers
    * [cx·w, (cx+1)·w), so the overlap length is an exact integer in
    * scaled units and every pixel contributes to each cell precisely
    * its covered area. Truncated integer boundaries (cx·w/9) would make
    * the effective cell windows of an image and its resized copy
    * misalign by up to a pixel per edge — measured, that jitter alone
    * pushed one planted 90%-resize from Hamming ≤ 2 to 5. With exact
    * areas the cell means of the two renders differ only by the
    * resampling error INSIDE the window, which the averaging cancels.
    * Weights ≤ HashW·HashH = 72, cell sums ≤ 255·72·(w/9+2)·(h/8+2) and
    * the cross-multiplied compare stays far under 2⁶³ for any image a
    * corpus would hash (guarded: w·h ≤ 2²⁴). */
  def dhash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    if (w < HashW || h < HashH)
      throw new UnhashableAssetException("too_small",
        s"dhash64 needs at least ${HashW}x$HashH pixels, got ${w}x$h")
    if (w.toLong * h > (1L << 24))
      throw new UnhashableAssetException("oversized",
        s"dhash64 overflow guard: ${w}x$h exceeds 2^24 pixels")
    val sums = Array.ofDim[Long](HashH, HashW)
    val areas = Array.ofDim[Long](HashH, HashW)
    var cy = 0
    while (cy < HashH) {
      val cy0 = cy.toLong * h // cell bounds in h-scaled-by-HashH units
      val cy1 = cy0 + h
      val py0 = (cy0 / HashH).toInt // first overlapping pixel row
      val py1 = math.min(h - 1, ((cy1 - 1) / HashH).toInt)
      var cx = 0
      while (cx < HashW) {
        val cx0 = cx.toLong * w
        val cx1 = cx0 + w
        val px0 = (cx0 / HashW).toInt
        val px1 = math.min(w - 1, ((cx1 - 1) / HashW).toInt)
        var s = 0L
        var area = 0L
        var y = py0
        while (y <= py1) {
          val oy = math.min((y + 1).toLong * HashH, cy1) -
            math.max(y.toLong * HashH, cy0)
          var x = px0
          while (x <= px1) {
            val ox = math.min((x + 1).toLong * HashW, cx1) -
              math.max(x.toLong * HashW, cx0)
            val p = img.getRGB(x, y)
            val lum = (299 * ((p >> 16) & 255) + 587 * ((p >> 8) & 255) +
              114 * (p & 255)) / 1000
            s += lum * ox * oy
            area += ox * oy
            x += 1
          }
          y += 1
        }
        sums(cy)(cx) = s
        areas(cy)(cx) = area
        cx += 1
      }
      cy += 1
    }
    var bits = 0L
    cy = 0
    while (cy < HashH) {
      var cx = 0
      while (cx < HashW - 1) {
        // mean(cx+1) > mean(cx), cross-multiplied (exact; all cells of
        // one image share the same area here, but the form also stays
        // exact if the grid ever changes)
        val gt = sums(cy)(cx + 1) * areas(cy)(cx) >
          sums(cy)(cx) * areas(cy)(cx + 1)
        bits = (bits << 1) | (if (gt) 1L else 0L)
        cx += 1
      }
      cy += 1
    }
    bits
  }

  /** Distributed synthetic image corpus for the scale sweeps: `n`
    * deterministic smooth renders, ENCODED WHERE THE ROWS LIVE
    * (per-partition PNG encode — a driver-side loop here would be the
    * collect anti-pattern the sweep exists to catch). Geometry cycles
    * the fixture's shapes; content varies by asset id. */
  def syntheticImageFrame(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(0L, n, 1L, 32).as[Long].mapPartitions(_.map { i =>
      val (w, h) = geometry((i % 1000L).toInt)
      ImageAsset(i, encodePng(renderSmooth(i, w, h, 0)))
    }).toDF()
  }

  /** Decode + hash one asset. */
  def hashAsset(a: ImageAsset): ImageHash =
    ImageHash(a.asset_id, dhash64(MultimodalOps.decodeImage(a.payload)))

  /** Distributed decode+hash over a BINARY image frame (asset_id,
    * payload): 16-byte hash rows out, per-partition (the
    * [[MultimodalOps.extractFeatures]] codec-affinity shape — at scale
    * the decode runs where the bytes live and only hashes ever
    * shuffle). The at-rest `phash` index kind's ingest stage.
    *
    * UNDECODABLE payloads (corrupt containers, unknown formats, images
    * below the 9×8 hash grid, null bytes) are DROPPED deterministically
    * instead of killing the job — at corpus scale corrupt assets are
    * routine, and one bad file must not fail a million-row partition.
    * Downstream consequence, by construction: such assets can never
    * near-dup-match anything, and the streaming gates never accept
    * them (no hash row ⇒ not a survivor) — undecodable data fails
    * curation, which is the policy a training corpus wants. */
  def imageHashRows(images: DataFrame): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("asset_id"), col("payload")).as[ImageAsset]
      .mapPartitions(_.flatMap(a => classifyImage(a).toOption))
      .toDF()
  }

  /** Decode-and-classify, total: Right(hash) for a hashable image,
    * Left(reason) otherwise — the audit surface behind
    * [[imageRejects]], distinguishing the drop classes
    * [[imageHashRows]] used to conflate:
    *  - `too_small` — decoded fine but under the 9×8 hash grid;
    *  - `oversized` — past the [[dhash64]] 2²⁴-pixel overflow guard
    *    (the only VALID-data drop this family still has — unlike audio
    *    there is no chunking story for one giant image; a corpus
    *    should thumbnail such assets upstream);
    *  - `corrupt` — everything the decoder rejects (unknown container,
    *    truncated stream, null payload). */
  def classifyImage(a: ImageAsset): Either[String, ImageHash] =
    try Right(hashAsset(a))
    catch {
      case e: UnhashableAssetException => Left(e.reason)
      case scala.util.control.NonFatal(_) => Left("corrupt")
    }

  /** The audit twin of [[imageHashRows]]: one (asset_id, reason) row
    * per asset the hash path drops. Same per-partition decode — see
    * [[AudioDedupOps.audioRejects]] for the two-pass note. */
  def imageRejects(images: DataFrame): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("asset_id"), col("payload")).as[ImageAsset]
      .mapPartitions(_.flatMap(a => classifyImage(a).left.toOption
        .map(reason => AssetReject(a.asset_id, reason))))
      .toDF()
  }

  /** The 4×16-bit band explode of a (asset_id, phash) frame — the
    * multi-index Hamming search key rows, shared by the batch pair
    * query and the at-rest `phash` index layout so probe keys and
    * stored keys can never drift. */
  def bandRows(hashes: DataFrame): DataFrame =
    hashes.select(col("asset_id"), col("phash"),
      explode(expr(s"sequence(0, ${NumBands - 1})")).as("band"))
      .withColumn("band_key", expr(
        s"shiftrightunsigned(phash, (${NumBands - 1} - band) * 16) & 65535"))

  /** Decode+hash the fixture corpus — materialized once (the
    * one-decode discipline: the banded self-join reads 16-byte rows,
    * never a second decode pass). */
  def imageHashes(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    imageHashRows(imageAssets(n).toDF()).localCheckpoint()
  }

  /** Near-dup pairs at Hamming ≤ [[MaxHamming]] from a (asset_id, phash)
    * frame: 4×16-bit band explode, [[DedupOps.MaxBucketSize]]-capped
    * candidate join (one keyed exchange), codegen'd bit_count verify.
    * Exact vs brute force while no bucket exceeds the cap (pigeonhole —
    * see object doc); an over-cap band value is the family's documented
    * boilerplate drop. */
  def phashNearDupPairs(hashes: DataFrame): DataFrame = {
    val capped = DedupOps.capBuckets(bandRows(hashes),
      Seq("band", "band_key"), DedupOps.MaxBucketSize)
    val a = capped.select(col("asset_id").as("id_a"),
      col("phash").as("h_a"), col("band"), col("band_key"))
    val b = capped.select(col("asset_id").as("id_b"),
      col("phash").as("h_b"), col("band"), col("band_key"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("h_a"), col("h_b"))
      .distinct() // a pair may meet in up to 4 bands; report it once
      .withColumn("hamming",
        expr("CAST(bit_count(h_a ^ h_b) AS INT)"))
      .filter(col("hamming") <= MaxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Driver-side hashes for the oracle — same code path as the engine
    * (the multimodal-family convention: the VALUES oracle pins the
    * distributed plumbing, band-join completeness, and the
    * Spark-vs-DuckDB bit_count/xor parity). */
  private lazy val oracleHashes: Seq[ImageHash] =
    imageAssets(NumImages).map(hashAsset)

  /** Green-gate query: the full decode → hash → banded-join pipeline vs
    * a DuckDB cross-check that mirrors the DECLARED semantics — the
    * band-OR candidate condition plus the Hamming verify (the
    * `dedup_minhash_lsh` oracle precedent). Arithmetic `>>` then
    * `& 65535` equals Spark's `shiftrightunsigned` + mask (the mask
    * discards the sign-fill bits), so both sides extract identical band
    * values from the signed 64-bit hash. */
  val phashDedup: GraftQuery = GraftQuery(
    "multimodal_phash_dedup",
    (s, _) => phashNearDupPairs(imageHashes(s, NumImages)),
    Some {
      val rows = oracleHashes
        .map(x => s"(CAST(${x.asset_id} AS BIGINT), " +
          s"CAST(${x.phash} AS BIGINT))")
        .mkString(", ")
      val bandMatch = (0 until NumBands)
        .map(k => s"((a.phash >> ${(NumBands - 1 - k) * 16}) & 65535) = " +
          s"((b.phash >> ${(NumBands - 1 - k) * 16}) & 65535)")
        .mkString(" OR ")
      s"""WITH h(asset_id, phash) AS (VALUES $rows)
         |SELECT a.asset_id AS id_a, b.asset_id AS id_b,
         |  CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
         |FROM h a JOIN h b ON a.asset_id < b.asset_id
         |WHERE bit_count(xor(a.phash, b.phash)) <= $MaxHamming
         |  AND ($bandMatch)"""
        .stripMargin
    })

  /** Near-dup CLUSTERS over the pair report — the operational form of
    * image dedup (keep one witness per component, drop the rest): the
    * banded pairs feed the family's neighbor-min transitive closure
    * ([[CurationOps.connectedComponents]] — one shuffle per round,
    * O(diameter) rounds, no pair explosion). Every planted quadruple
    * {i, i+1000, i+2000, i+3000} must collapse to component i. The
    * oracle recomputes the closure as a recursive CTE over the SAME
    * band-OR edge set (the `dedup_clusters` precedent). */
  val phashClusters: GraftQuery = GraftQuery(
    "multimodal_phash_clusters",
    (s, _) => CurationOps.connectedComponents(
      phashNearDupPairs(imageHashes(s, NumImages))
        .select(col("id_a"), col("id_b"))),
    Some {
      val rows = oracleHashes
        .map(x => s"(CAST(${x.asset_id} AS BIGINT), " +
          s"CAST(${x.phash} AS BIGINT))")
        .mkString(", ")
      val bandMatch = (0 until NumBands)
        .map(k => s"((a.phash >> ${(NumBands - 1 - k) * 16}) & 65535) = " +
          s"((b.phash >> ${(NumBands - 1 - k) * 16}) & 65535)")
        .mkString(" OR ")
      s"""WITH RECURSIVE h(asset_id, phash) AS (VALUES $rows),
         |edges AS (
         |  SELECT a.asset_id AS ia, b.asset_id AS ib
         |  FROM h a JOIN h b ON a.asset_id < b.asset_id
         |  WHERE bit_count(xor(a.phash, b.phash)) <= $MaxHamming
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

  // -------------------------------------------------------------------
  // Perceptual decontamination — the multimodal twin of the text
  // decontaminate family: which CORPUS images are near-dups of a
  // BENCHMARK image (eval-set leakage; a training corpus that contains
  // a re-encoded benchmark image contaminates every model trained on
  // it). Composition of existing ingredients: both sides hash per
  // partition, the benchmark side is tiny and BROADCASTS — no
  // self-join, no shuffle of corpus rows at all (the corpus-side band
  // explode stays in its scan stage and meets the broadcast map-side).
  // The at-rest form is [[graft.store.IndexStore.search]]("phash",
  // benchAssets) against an already-built index; this operator is the
  // one-shot batch form.
  // -------------------------------------------------------------------

  /** Corpus-vs-benchmark near-dup report: (asset_id, eval_id,
    * hamming) for every corpus asset within [[MaxHamming]] of a
    * benchmark asset under the band-OR candidate condition. `corpus`
    * and `bench` are binary (asset_id, payload) frames; the benchmark
    * side must be small (it broadcasts — eval sets are). */
  def phashContamination(corpus: DataFrame, bench: DataFrame): DataFrame = {
    val c = bandRows(imageHashRows(corpus))
    val b = bandRows(imageHashRows(bench))
      .select(col("asset_id").as("eval_id"), col("phash").as("h_b"),
        col("band"), col("band_key"))
    c.join(broadcast(b), Seq("band", "band_key"))
      .select(col("asset_id"), col("eval_id"), col("phash"), col("h_b"))
      .distinct() // a pair may meet in up to 4 bands; report it once
      .withColumn("hamming", expr("CAST(bit_count(phash ^ h_b) AS INT)"))
      .filter(col("hamming") <= MaxHamming)
      .select(col("asset_id"), col("eval_id"), col("hamming"))
  }

  /** Deterministic benchmark fixture: re-encodes of corpus seeds 0..2
    * under eval ids 9000+, plus two fresh renders (unseen content
    * seeds) that must NOT flag. */
  private def benchAssets: Seq[ImageAsset] = {
    val base = imageAssets(NumImages)
    (0 until 3).map(i => ImageAsset(9000L + i,
      reencode(base(i).payload))) ++
      Seq(ImageAsset(9100L, encodePng(renderSmooth(50001L, 112, 96, 0))),
        ImageAsset(9101L, encodePng(renderSmooth(50002L, 96, 128, 0))))
  }

  private lazy val oracleBenchHashes: Seq[ImageHash] =
    benchAssets.map(hashAsset)

  /** Green-gate query: every benchmark re-encode flags its corpus
    * source (d = 0); fresh benchmark images flag nothing. The oracle
    * mirrors the band-OR + Hamming condition over BOTH hash sets. */
  val phashDecontaminate: GraftQuery = GraftQuery(
    "multimodal_decontaminate",
    (s, _) => {
      import s.implicits._
      phashContamination(
        imageAssets(NumImages).filter(_.asset_id < NumImages).toDF(),
        benchAssets.toDF())
    },
    Some {
      val corpusRows = oracleHashes
        .filter(_.asset_id < NumImages)
        .map(x => s"(CAST(${x.asset_id} AS BIGINT), " +
          s"CAST(${x.phash} AS BIGINT))")
        .mkString(", ")
      val benchRows = oracleBenchHashes
        .map(x => s"(CAST(${x.asset_id} AS BIGINT), " +
          s"CAST(${x.phash} AS BIGINT))")
        .mkString(", ")
      val bandMatch = (0 until NumBands)
        .map(k => s"((c.phash >> ${(NumBands - 1 - k) * 16}) & 65535) = " +
          s"((b.phash >> ${(NumBands - 1 - k) * 16}) & 65535)")
        .mkString(" OR ")
      s"""WITH c(asset_id, phash) AS (VALUES $corpusRows),
         |b(eval_id, phash) AS (VALUES $benchRows)
         |SELECT c.asset_id, b.eval_id,
         |  CAST(bit_count(xor(c.phash, b.phash)) AS INTEGER) AS hamming
         |FROM c JOIN b ON bit_count(xor(c.phash, b.phash)) <= $MaxHamming
         |  AND ($bandMatch)"""
        .stripMargin
    })

  val all: Seq[GraftQuery] =
    Seq(phashDedup, phashClusters, phashDecontaminate)
}
