package graft.operators

import graft.GraftQuery
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal (image/audio/video) column plumbing (SURVEY §7.6).
  *
  * Media payloads are opaque `binary` columns with typed metadata, exactly
  * as a 100 TB training corpus stores them; decode / feature-extraction
  * runs per-partition so a real codec (JNI image/audio library) would be
  * loaded once per executor, batch-process rows, and never touch the
  * driver. The codec itself is STUBBED here (container ships no media
  * libraries): `stubDecode` is a deterministic fake standing in for e.g.
  * JPEG decode + resize or PCM frame sampling. The Spark-side contract —
  * schema, binary handling, partition shape, per-partition batching — is
  * real and oracle-tested.
  */
object MultimodalOps {

  final case class Asset(
      asset_id: Long,
      kind: String, // image | audio
      payload: Array[Byte],
      width: Int, // image meta (0 for audio)
      height: Int,
      sample_rate: Int) // audio meta (0 for image)

  final case class AssetFeatures(
      asset_id: Long,
      kind: String,
      byte_len: Int,
      checksum: Long,
      feat_dim: Int)

  /** Deterministic synthetic corpus: payload bytes derived from asset id. */
  def assets(n: Int): Seq[Asset] = (0 until n).map { i =>
    val kind = if (i % 2 == 0) "image" else "audio"
    val len = 64 + (i * 37) % 192
    val payload = Array.tabulate[Byte](len)(j => ((i * 131 + j * 17) % 251).toByte)
    if (kind == "image") Asset(i.toLong, kind, payload, 32 + i % 64, 32 + i % 48, 0)
    else Asset(i.toLong, kind, payload, 0, 0, 8000 + 100 * (i % 80))
  }

  /** Rolling 31x checksum over bytes — the shared deterministic stand-in
    * for decoded-content identity across all three stub codecs. */
  private def checksum(bytes: Iterable[Byte]): Long = {
    var c = 0L
    bytes.foreach(b => c = (c * 31 + (b & 0xff)) & 0xffffffffL)
    c
  }

  /** STUB decode: stands in for the real media decode + feature extract.
    * Deterministic over the payload so the pipeline is testable; swap the
    * body for a real codec without touching the surrounding plan. */
  def stubDecode(a: Asset): AssetFeatures = {
    val featDim =
      if (a.kind == "image") (a.width * a.height) / 64 else a.sample_rate / 100
    AssetFeatures(a.asset_id, a.kind, a.payload.length, checksum(a.payload),
      featDim)
  }

  val NumAssets = 64

  /** Feature-extraction pipeline: binary corpus → repartition by kind
    * (codec affinity: one codec per partition at scale) → per-partition
    * batch decode → typed features. */
  def extractFeatures(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    assets(n).toDS()
      .repartition(col("kind"))
      .mapPartitions(_.map(stubDecode))
      .toDF()
  }

  /** Oracle from the same deterministic formula computed driver-side,
    * without Spark — checks the distributed plumbing end-to-end. */
  val features: GraftQuery = GraftQuery(
    "multimodal_features",
    (s, _) => extractFeatures(s, NumAssets),
    Some {
      val rows = assets(NumAssets).map(stubDecode).map(f =>
        s"(${f.asset_id}, '${f.kind}', ${f.byte_len}, ${f.checksum}, ${f.feat_dim})")
      "SELECT CAST(asset_id AS BIGINT) AS asset_id, kind, " +
        "CAST(byte_len AS INTEGER) AS byte_len, " +
        "CAST(checksum AS BIGINT) AS checksum, " +
        "CAST(feat_dim AS INTEGER) AS feat_dim " +
        s"FROM (VALUES ${rows.mkString(", ")}) " +
        "AS t(asset_id, kind, byte_len, checksum, feat_dim)"
    })

  // ---------------------------------------------------------------------
  // Frame sampling (audio/video → per-frame rows)
  // ---------------------------------------------------------------------

  final case class Frame(
      asset_id: Long,
      frame_idx: Int,
      frame_len: Int,
      frame_checksum: Long)

  /** Frame size in payload bytes — stands in for e.g. 20 ms of PCM or a
    * video keyframe stride; real pipelines pick it from the codec. */
  val FrameBytes = 48

  private def payloadFrames(a: Asset): Seq[Frame] =
    a.payload.grouped(FrameBytes).zipWithIndex.map { case (chunk, idx) =>
      Frame(a.asset_id, idx, chunk.length, checksum(chunk))
    }.toSeq

  /** Frame sampling: ONE binary row fans out to ceil(len/FrameBytes)
    * frame rows — the `flatMap` shape a real frame sampler has. Runs in
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
      val rows = assets(NumAssets).filter(_.kind == "audio")
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
      byte_len: Int,
      checksum: Long)

  /** STUB resize to `tw`×`th`: payload subsampled at the ratio a real
    * scaler would use (one byte per target pixel block, deterministic),
    * metadata recomputed. Swap the body for a real image library; the
    * binary-in/binary-out per-partition shape is what survives. */
  def stubResize(a: Asset, tw: Int, th: Int): ResizedAsset = {
    val stride = math.max(1, a.payload.length / math.max(1, (tw * th) / 64))
    val resized = a.payload.indices.collect {
      case j if j % stride == 0 => a.payload(j)
    }
    ResizedAsset(a.asset_id, tw, th, resized.length, checksum(resized))
  }

  val TargetW = 16
  val TargetH = 16

  /** Resize pipeline over the image rows: same per-partition batch shape
    * as [[extractFeatures]] (codec loaded once per partition at scale). */
  def resizeImages(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    assets(n).toDS()
      .filter(col("kind") === "image")
      .mapPartitions(_.map(stubResize(_, TargetW, TargetH)))
      .toDF()
  }

  val resize: GraftQuery = GraftQuery(
    "multimodal_resize",
    (s, _) => resizeImages(s, NumAssets),
    Some {
      val rows = assets(NumAssets).filter(_.kind == "image")
        .map(stubResize(_, TargetW, TargetH))
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
