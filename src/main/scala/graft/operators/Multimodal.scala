package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus the decode / feature-extract / resize / frame-
  * sample stages a training-data pipeline runs over them.
  *
  * The media codecs themselves are NOT available in this environment, so
  * the decode kernels are STUBS — deterministic fakes seeded from the
  * payload bytes (clearly marked below). Everything around them is real
  * and load-bearing: the schema, the batch-shaped mapPartitions execution
  * (one codec init per partition, the JVM analog of a batched pandas UDF),
  * the partitioning behavior, and the typed output columns. Swapping a
  * stub for javacv/ffmpeg changes one function body, not the plan.
  */
object Multimodal {

  case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      source: String,
      n_bytes: Long
  )

  case class DecodedImage(
      media_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      ok: Boolean
  )

  case class MediaFeature(media_id: Long, feature: Array[Float])

  case class VideoFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Build a media table from any (id, payload-ish string) source — used by
    * tests to get binary columns out of the driver testdata without
    * synthesizing new files. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs
      .select(
        col("doc_id").as("media_id"),
        // deterministic kind assignment
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        col("source")
      )
      // byte length of the PAYLOAD (length on binary counts bytes) — a
      // character count would understate multi-byte text and make frame
      // sampling silently skip the payload tail
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .as[MediaRow]
  }

  // ---------------------------------------------------------------------
  // STUB decode kernels — deterministic fakes in place of real codecs.
  // ---------------------------------------------------------------------

  /** STUB: a real implementation would hand `bytes` to an image codec.
    * The fake derives dimensions from a stable byte-hash so tests are
    * deterministic and partition-order-independent. */
  private def stubDecodeImage(bytes: Array[Byte]): (Int, Int, Int) = {
    val h = java.util.Arrays.hashCode(bytes)
    val w = 64 + math.floorMod(h, 512)
    val ht = 64 + math.floorMod(h >> 9, 512)
    (w, ht, 3)
  }

  /** STUB: fake feature extractor — a stable pseudo-embedding from the
    * payload (in reality: a vision/audio model forward pass). */
  private def stubFeature(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    var j = 0
    while (j < dim) {
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17
      out(j) = ((h & 0xffff) / 65535.0f) - 0.5f
      j += 1
    }
    out
  }

  /** Decode stage: batch-shaped (mapPartitions) so a real codec/model is
    * initialized once per partition, not per row — the JVM equivalent of
    * `mapInPandas` batch semantics. */
  def decodeImages(spark: SparkSession, media: Dataset[MediaRow]): Dataset[DecodedImage] =
    decodeImagesWith(spark, media, stubDecodeImage)

  /** The codec SEAM: same stage, caller-supplied decode kernel
    * (bytes => (width, height, channels)). The default stage passes the
    * stub here; MultimodalSpec passes a real javax.imageio decoder
    * through the same seam — one function value swaps, the plan
    * (scan → mapPartitions → serialize) does not change. */
  def decodeImagesWith(
      spark: SparkSession,
      media: Dataset[MediaRow],
      decode: Array[Byte] => (Int, Int, Int)
  ): Dataset[DecodedImage] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (codec handles, model session)
      rows.collect {
        case r if r.kind == "image" =>
          val (w, h, c) = decode(r.payload)
          DecodedImage(r.media_id, w, h, c, ok = true)
      }
    }
  }

  /** Feature extraction for any media kind → fixed-dim float vector,
    * ready for the similarity-search operators (LlmOps e01/e02). */
  def extractFeatures(
      spark: SparkSession,
      media: Dataset[MediaRow],
      dim: Int = 64
  ): Dataset[MediaFeature] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map(r => MediaFeature(r.media_id, stubFeature(r.payload, dim)))
    }
  }

  case class ResizedImage(
      media_id: Long,
      width: Int,
      height: Int,
      n_bytes: Long,
      payload: Array[Byte]
  )

  /** STUB resize kernel: nearest-neighbor byte resample to the target
    * pixel-buffer size (w*h*3) — deterministic in the payload, the honest
    * fake of image scaling (a real impl decodes, scales, re-encodes). */
  private def stubResizeBytes(bytes: Array[Byte], target: Int): Array[Byte] = {
    val out = new Array[Byte](target)
    if (bytes.nonEmpty) {
      var i = 0
      while (i < target) {
        out(i) = bytes(((i.toLong * bytes.length) / target).toInt)
        i += 1
      }
    }
    out
  }

  /** Resize stage: image rows only, batch-shaped like decode (one scaler
    * init per partition). Output payload is exactly w*h*3 bytes — the
    * fixed-size tensor shape a training loader expects. */
  def resizeImages(
      spark: SparkSession,
      media: Dataset[MediaRow],
      width: Int = 32,
      height: Int = 32
  ): Dataset[ResizedImage] =
    resizeImagesWith(spark, media, width, height,
      (bytes, w, h) => stubResizeBytes(bytes, w * h * 3))

  /** The resize SEAM (see decodeImagesWith): caller-supplied scale kernel
    * (bytes, width, height) => w*h*3 pixel buffer. */
  def resizeImagesWith(
      spark: SparkSession,
      media: Dataset[MediaRow],
      width: Int,
      height: Int,
      resize: (Array[Byte], Int, Int) => Array[Byte]
  ): Dataset[ResizedImage] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (scaler/codec handles)
      rows.collect {
        case r if r.kind == "image" =>
          val px = resize(r.payload, width, height)
          ResizedImage(r.media_id, width, height, px.length.toLong, px)
      }
    }
  }

  /** Frame sampling: every video yields ceil(n_bytes / stride) pseudo-
    * frames (a real impl samples at timestamps via the container index).
    * flatMap shape — output cardinality is data-dependent, exactly like
    * real frame extraction. */
  def sampleFrames(
      spark: SparkSession,
      media: Dataset[MediaRow],
      stride: Int = 100
  ): Dataset[VideoFrame] = {
    import spark.implicits._
    media.flatMap { r =>
      if (r.kind != "video") Iterator.empty
      else {
        val n = math.max(1, ((r.n_bytes + stride - 1) / stride).toInt)
        (0 until n).iterator.map { i =>
          val from = math.min(i * stride, r.payload.length)
          val until = math.min(from + stride, r.payload.length)
          VideoFrame(r.media_id, i, java.util.Arrays.copyOfRange(r.payload, from, until))
        }
      }
    }
  }
}
