package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Multimodal-column pipeline: image/audio/video as opaque `binary`
  * columns with typed metadata, decode → feature-extract over
  * mapPartitions.
  *
  * The DECODE STEP IS A STUB: real image/audio codecs are not in this
  * container, so `decodeStub` produces a deterministic fake "decode"
  * (byte histogram) — clearly marked below. Everything around it is the
  * real Spark plumbing a production pipeline needs and what the tests
  * cover: declared binary schema, partition-local batch processing
  * (one reusable buffer per partition, the mapPartitions analog of a
  * batched pandas-UDF), fixed-width feature vectors, and metadata
  * columns that survive the boundary.
  *
  * 100 TB notes: payloads dominate size → never shuffle them. Features
  * are extracted scan-side (narrow), only the (id, features, meta)
  * projection ever reaches a shuffle; frame-sampling keeps per-row
  * output bounded regardless of payload size.
  */
object MultimodalOps {

  final case class Asset(asset_id: Long, modality: String,
      payload: Array[Byte], meta_width: Int, meta_rate: Int)

  final case class AssetFeatures(asset_id: Long, modality: String,
      n_bytes: Int, features: Array[Float])

  /** Build opaque binary assets from documents (the container has no
    * real media files; text bytes stand in for encoded payloads). */
  def assets(s: SparkSession, d: String): Dataset[Asset] = {
    import s.implicits._
    Tables.documents(s, d).select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("payload"),
      lit(64).as("meta_width"),
      lit(16000).as("meta_rate")).as[Asset]
  }

  /** STUB — stands in for a real codec (JPEG decode / PCM resample /
    * frame grab). Deterministic: 8-bin byte histogram normalized by
    * length. Swap this body for the real decoder; the signature and
    * the surrounding batching are the production shape. */
  private def decodeStub(payload: Array[Byte], bins: Array[Float]): Array[Float] = {
    java.util.Arrays.fill(bins, 0f)
    var i = 0
    while (i < payload.length) {
      bins((payload(i) & 0xff) >> 5) += 1f
      i += 1
    }
    if (payload.length > 0) {
      var j = 0
      while (j < bins.length) { bins(j) /= payload.length; j += 1 }
    }
    bins.clone()
  }

  /** Feature extraction: partition-local loop with a reused scratch
    * buffer — the batched-UDF execution shape without a per-row alloc. */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val scratch = new Array[Float](8) // reused across the partition
      it.map { a =>
        AssetFeatures(a.asset_id, a.modality, a.payload.length,
          decodeStub(a.payload, scratch))
      }
    }
  }

  /** Frame sampling: every `stride`-th 16-byte window as a "frame";
    * bounds per-asset output no matter the payload size. */
  def sampleFrames(assets: Dataset[Asset], stride: Int = 64): DataFrame = {
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      val n = math.max(0, (a.payload.length - 16) / stride + 1)
      (0 until math.min(n, 8)).map { f =>
        (a.asset_id, f, a.payload.slice(f * stride, f * stride + 16))
      }
    }.toDF("asset_id", "frame_no", "frame_bytes")
  }

  /** Resize/resample: decimate each payload to a fixed target length
    * (every k-th byte) — the "thumbnail"/downsample shape. Output width
    * is constant per asset, so downstream batch shapes (fixed-width
    * tensors) hold regardless of input size. Swap the decimation for a
    * real scaler; the per-partition plumbing is the production shape. */
  def resize(assets: Dataset[Asset], target: Int = 32): Dataset[(Long, Array[Byte])] = {
    import assets.sparkSession.implicits._
    assets.map { a =>
      // empty payload → empty output (never fabricate bytes)
      val out = new Array[Byte](math.min(target, a.payload.length))
      val step = if (out.isEmpty) 1 else math.max(1, a.payload.length / out.length)
      var i = 0
      while (i < out.length && i * step < a.payload.length) {
        out(i) = a.payload(i * step); i += 1
      }
      (a.asset_id, out)
    }
  }

  /** Graded query: per-modality feature summary through the decode
    * stub. Oracle-backed — the stub's bin 0 counts bytes < 0x20, which
    * SQL can count too (UTF-8 continuation bytes are ≥ 0x80, so
    * byte-wise and char-wise control counts agree), and the byte
    * totals go through the same encode() the binary cast applies. */
  def featureSummary(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    extractFeatures(assets(s, d)).toDF()
      .select(col("asset_id"), col("modality"), col("n_bytes"),
        element_at(col("features"), 1).as("f0"))
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("f0")), 4).as("avg_f0"))
      .orderBy(col("modality"))
  }

  private val featureSummarySql =
    """SELECT modality, COUNT(*) AS n_assets,
      | CAST(SUM(OCTET_LENGTH(encode(text))) AS BIGINT) AS total_bytes,
      | ROUND(AVG(CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[\x00-\x1f]', '', 'g')) AS DOUBLE)
      |           / OCTET_LENGTH(encode(text))), 4) AS avg_f0
      |FROM (SELECT CASE CAST(doc_id % 3 AS INT)
      |        WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
      |       text FROM documents) t
      |GROUP BY modality ORDER BY modality""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q54_multimodal_features", featureSummary, Some(featureSummarySql),
      "multimodal decode-stub feature pipeline"))
}
