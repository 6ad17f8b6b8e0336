package graft.operators

import graft.GraftQuery
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal (image/audio) column plumbing (SURVEY §7.6).
  *
  * Media payloads are opaque `binary` columns with typed metadata, exactly
  * as a 100 TB training corpus stores them; decode / feature-extraction
  * runs per-partition so the codec is initialized once per executor,
  * batch-processes rows, and never touches the driver.
  *
  * The codecs are REAL pure-JVM decoders (no external deps, no egress):
  * image payloads are PNG containers decoded with `javax.imageio`
  * (lossless — decoded pixels are bit-exact and deterministic), audio
  * payloads are WAV/PCM containers parsed with `javax.sound.sampled`.
  * The fixture corpus generates the containers deterministically from the
  * asset id, so every decoded value is reproducible driver-side — that is
  * what the VALUES oracles below recompute. Resize is an explicit
  * nearest-neighbor kernel over the decoded pixels (not `Graphics2D`,
  * whose filtering is implementation-defined), keeping results identical
  * across JVMs.
  */
object MultimodalOps {

  final case class Asset(
      asset_id: Long,
      kind: String, // image | audio
      payload: Array[Byte], // PNG container | WAV container
      width: Int, // image meta (0 for audio)
      height: Int,
      sample_rate: Int) // audio meta (0 for image)

  final case class AssetFeatures(
      asset_id: Long,
      kind: String,
      byte_len: Int, // encoded container size
      checksum: Long, // over DECODED content (pixels / PCM samples)
      feat_dim: Int)

  /** Deterministic RGB value of pixel (x, y) of image asset i. */
  private[graft] def pixel(i: Int, x: Int, y: Int): Int = {
    val r = (i * 131 + x * 17 + y * 29) % 256
    val g = (i * 37 + x * 5 + y * 11) % 256
    val b = (i * 59 + x * 23 + y * 3) % 256
    (r << 16) | (g << 8) | b
  }

  /** Deterministic 8-bit PCM sample j of audio asset i (unsigned byte,
    * the WAV convention for 8-bit). */
  private def sample(i: Int, j: Int): Int = (i * 131 + j * 17) % 251

  /** PNG-encode the deterministic image for asset i. */
  private def pngPayload(i: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pixel(i, x, y)); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** WAV-encode (PCM_UNSIGNED 8-bit mono) the deterministic samples. */
  private def wavPayload(i: Int, nSamples: Int, rate: Int): Array[Byte] = {
    val pcm = Array.tabulate[Byte](nSamples)(j => sample(i, j).toByte)
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
      rate.toFloat, 8, 1, 1, rate.toFloat, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Deterministic synthetic corpus of real PNG/WAV containers. */
  def assets(n: Int): Seq[Asset] = (0 until n).map { i =>
    if (i % 2 == 0) {
      val (w, h) = (32 + i % 64, 32 + i % 48)
      Asset(i.toLong, "image", pngPayload(i, w, h), w, h, 0)
    } else {
      val rate = 8000 + 100 * (i % 80)
      Asset(i.toLong, "audio", wavPayload(i, 64 + (i * 37) % 192, rate),
        0, 0, rate)
    }
  }

  /** Rolling 31x checksum — decoded-content identity in the feature rows
    * (pixel bytes for images, PCM sample bytes for audio). */
  private def checksum(bytes: Iterable[Byte]): Long = {
    var c = 0L
    bytes.foreach(b => c = (c * 31 + (b & 0xff)) & 0xffffffffL)
    c
  }

  /** One-time JVM-global codec setup (per executor JVM, not per row):
    * ImageIO's disk cache is disabled — executor decode must never touch
    * local temp files. */
  private lazy val imageioReady: Boolean = {
    javax.imageio.ImageIO.setUseCache(false)
    true
  }

  /** Decode an image payload to its pixel matrix (PNG is lossless, so
    * this is exact). */
  private[graft] def decodeImage(payload: Array[Byte]): java.awt.image.BufferedImage = {
    require(imageioReady)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null, "undecodable image payload")
    img
  }

  /** Decoded RGB bytes in row-major (r, g, b) order. */
  private[graft] def rgbBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Byte](w * h * 3)
    var y = 0
    var k = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        out(k) = ((p >> 16) & 0xff).toByte
        out(k + 1) = ((p >> 8) & 0xff).toByte
        out(k + 2) = (p & 0xff).toByte
        x += 1; k += 3
      }
      y += 1
    }
    out
  }

  /** Decode an audio payload's PCM sample bytes via javax.sound. */
  private[graft] def pcmBytes(payload: Array[Byte]): Array[Byte] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try ais.readAllBytes() finally ais.close()
  }

  /** REAL decode + feature extract: PNG → pixels / WAV → PCM samples;
    * the checksum fingerprints the decoded content, feat_dim is the
    * downstream embedding width ((w·h)/64 pixel blocks for images, one
    * dim per 10 ms of audio). */
  def decode(a: Asset): AssetFeatures =
    if (a.kind == "image") {
      val img = decodeImage(a.payload)
      AssetFeatures(a.asset_id, a.kind, a.payload.length,
        checksum(rgbBytes(img)), (img.getWidth * img.getHeight) / 64)
    } else {
      AssetFeatures(a.asset_id, a.kind, a.payload.length,
        checksum(pcmBytes(a.payload)), a.sample_rate / 100)
    }

  val NumAssets = 64

  /** The driver-side oracle corpus, generated once — since the codecs
    * became real, container generation is real work, and three VALUES
    * oracles below would otherwise each regenerate all [[NumAssets]]
    * payloads at enumeration time. */
  private lazy val oracleAssets: Seq[Asset] = assets(NumAssets)

  /** Feature-extraction pipeline: binary corpus → repartition by kind
    * (codec affinity: one codec per partition at scale) → per-partition
    * batch decode → typed features. */
  def extractFeatures(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    assets(n).toDS()
      .repartition(col("kind"))
      .mapPartitions(_.map(decode))
      .toDF()
  }

  /** Oracle from the same deterministic decode computed driver-side,
    * without Spark — checks the distributed plumbing end-to-end. */
  val features: GraftQuery = GraftQuery(
    "multimodal_features",
    (s, _) => extractFeatures(s, NumAssets),
    Some {
      val rows = oracleAssets.map(decode).map(f =>
        s"(${f.asset_id}, '${f.kind}', ${f.byte_len}, ${f.checksum}, ${f.feat_dim})")
      "SELECT CAST(asset_id AS BIGINT) AS asset_id, kind, " +
        "CAST(byte_len AS INTEGER) AS byte_len, " +
        "CAST(checksum AS BIGINT) AS checksum, " +
        "CAST(feat_dim AS INTEGER) AS feat_dim " +
        s"FROM (VALUES ${rows.mkString(", ")}) " +
        "AS t(asset_id, kind, byte_len, checksum, feat_dim)"
    })

  // ---------------------------------------------------------------------
  // Frame sampling (audio → per-frame rows over DECODED samples)
  // ---------------------------------------------------------------------

  final case class Frame(
      asset_id: Long,
      frame_idx: Int,
      frame_len: Int,
      frame_checksum: Long)

  /** Frame size in PCM samples — stands in for e.g. 20 ms of audio; real
    * pipelines pick it from the stream format. */
  val FrameBytes = 48

  private def payloadFrames(a: Asset): Seq[Frame] =
    pcmBytes(a.payload).grouped(FrameBytes).zipWithIndex.map {
      case (chunk, idx) => Frame(a.asset_id, idx, chunk.length,
        checksum(chunk))
    }.toSeq

  /** Frame sampling: ONE binary row fans out to ceil(samples/FrameBytes)
    * frame rows — the `flatMap` shape a real frame sampler has, over the
    * DECODED PCM stream (the WAV container is parsed per row). Runs in
    * the scan stage (no shuffle: fan-out is per-row); at 100 TB the only
    * shuffle anywhere downstream is whatever the consumer groups by.
    * Audio only — image rows don't frame-sample. */
  def sampleFrames(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    assets(n).toDS()
      .filter(col("kind") === "audio")
      .flatMap(payloadFrames _)
      .toDF()
  }

  val frames: GraftQuery = GraftQuery(
    "multimodal_frames",
    (s, _) => sampleFrames(s, NumAssets),
    Some {
      val rows = oracleAssets.filter(_.kind == "audio")
        .flatMap(payloadFrames)
        .map(f =>
          s"(${f.asset_id}, ${f.frame_idx}, ${f.frame_len}, ${f.frame_checksum})")
      "SELECT CAST(asset_id AS BIGINT) AS asset_id, " +
        "CAST(frame_idx AS INTEGER) AS frame_idx, " +
        "CAST(frame_len AS INTEGER) AS frame_len, " +
        "CAST(frame_checksum AS BIGINT) AS frame_checksum " +
        s"FROM (VALUES ${rows.mkString(", ")}) " +
        "AS t(asset_id, frame_idx, frame_len, frame_checksum)"
    })

  // ---------------------------------------------------------------------
  // Resize (image → image at a target geometry)
  // ---------------------------------------------------------------------

  final case class ResizedAsset(
      asset_id: Long,
      width: Int,
      height: Int,
      byte_len: Int, // resized pixel bytes (w·h·3)
      checksum: Long) // over the resized RGB byte stream

  /** REAL resize to `tw`×`th`: PNG-decode, then an explicit
    * nearest-neighbor sample of the source pixel grid — src(x·sw/tw,
    * y·sh/th) — which is pure integer arithmetic and therefore identical
    * on every JVM (Graphics2D scaling filters are not pinned by spec).
    * The per-partition binary-in/features-out shape is what survives at
    * scale. */
  def resizeImage(a: Asset, tw: Int, th: Int): ResizedAsset = {
    val img = decodeImage(a.payload)
    val (sw, sh) = (img.getWidth, img.getHeight)
    val out = new Array[Byte](tw * th * 3)
    var y = 0
    var k = 0
    while (y < th) {
      val sy = y * sh / th
      var x = 0
      while (x < tw) {
        val p = img.getRGB(x * sw / tw, sy)
        out(k) = ((p >> 16) & 0xff).toByte
        out(k + 1) = ((p >> 8) & 0xff).toByte
        out(k + 2) = (p & 0xff).toByte
        x += 1; k += 3
      }
      y += 1
    }
    ResizedAsset(a.asset_id, tw, th, out.length, checksum(out))
  }

  val TargetW = 16
  val TargetH = 16

  /** Resize pipeline over the image rows: same per-partition batch shape
    * as [[extractFeatures]] (codec loaded once per partition at scale). */
  def resizeImages(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    assets(n).toDS()
      .filter(col("kind") === "image")
      .mapPartitions(_.map(resizeImage(_, TargetW, TargetH)))
      .toDF()
  }

  val resize: GraftQuery = GraftQuery(
    "multimodal_resize",
    (s, _) => resizeImages(s, NumAssets),
    Some {
      val rows = oracleAssets.filter(_.kind == "image")
        .map(resizeImage(_, TargetW, TargetH))
        .map(r =>
          s"(${r.asset_id}, ${r.width}, ${r.height}, ${r.byte_len}, ${r.checksum})")
      "SELECT CAST(asset_id AS BIGINT) AS asset_id, " +
        "CAST(width AS INTEGER) AS width, " +
        "CAST(height AS INTEGER) AS height, " +
        "CAST(byte_len AS INTEGER) AS byte_len, " +
        "CAST(checksum AS BIGINT) AS checksum " +
        s"FROM (VALUES ${rows.mkString(", ")}) " +
        "AS t(asset_id, width, height, byte_len, checksum)"
    })

  val all: Seq[GraftQuery] = Seq(features, frames, resize)
}
