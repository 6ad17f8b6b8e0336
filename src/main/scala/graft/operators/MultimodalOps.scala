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

  /** STUB decode: stands in for the real media decode + feature extract.
    * Deterministic over the payload so the pipeline is testable; swap the
    * body for a real codec without touching the surrounding plan. */
  def stubDecode(a: Asset): AssetFeatures = {
    var checksum = 0L
    var j = 0
    while (j < a.payload.length) {
      checksum = (checksum * 31 + (a.payload(j) & 0xff)) & 0xffffffffL
      j += 1
    }
    val featDim =
      if (a.kind == "image") (a.width * a.height) / 64 else a.sample_rate / 100
    AssetFeatures(a.asset_id, a.kind, a.payload.length, checksum, featDim)
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

  val all: Seq[GraftQuery] = Seq(features)
}
