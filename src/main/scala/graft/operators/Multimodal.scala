package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus the decode / feature-extract / resize / frame-
  * sample stages a training-data pipeline runs over them.
  *
  * IMAGE kernels are REAL (r14): the JDK ships `javax.imageio` — PNG/
  * JPEG/BMP decode, pixel access, and resampling need no external
  * dependency, so `decodeImages`, image `extractFeatures`, and
  * `resizeImages` run a genuine codec by default, and
  * [[mediaWithRealImages]] synthesizes real PNG payloads whose dimensions
  * are pure id-arithmetic (oracle-expressible — the m01 gate pins the
  * full encode→PNG→decode roundtrip cross-engine). AUDIO/VIDEO codecs do
  * NOT ship in the JVM, so those kernels remain deterministic stubs
  * seeded from the payload bytes (clearly marked below); everything
  * around them is real and load-bearing — the schema, the batch-shaped
  * mapPartitions execution (one codec init per partition, the JVM analog
  * of a batched pandas UDF), the partitioning behavior, and the typed
  * output columns. Swapping an audio stub for javacv/ffmpeg changes one
  * function body, not the plan.
  */
object Multimodal {

  /** ImageIO's default stream cache is a TEMP FILE per encode/decode —
    * measured 5× CPU inflation from 32 threads contending on temp-file
    * creation once the codec stages were spread across cores. Every
    * payload here is an in-memory byte array, so the memory cache is
    * strictly better; flipped once per JVM, lazily, before any kernel
    * touches the registry. */
  private lazy val imageIoMemCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

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

  /** Build an OPAQUE-BINARY media table from any (id, payload-ish string)
    * source — binary columns out of the driver testdata without
    * synthesizing files. Payloads here are raw text bytes (NOT decodable
    * images — content-addressed stages like m05's dedup and byte-
    * arithmetic stages like m03's frame sampling want exactly that);
    * stages that DECODE use [[mediaWithRealImages]] instead. */
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

  /** The decodable twin of [[mediaFromDocuments]]: image rows carry REAL
    * PNG payloads — a deterministic raster whose dimensions are pure
    * id-arithmetic, `width = 4 + id % 13`, `height = 4 + (id / 13) % 11`
    * — and audio rows carry REAL 16-bit mono PCM WAV payloads with
    * `n_samples = 400 + id % 997` at 8 kHz (the JDK's javax.sound
    * decodes WAV natively, as javax.imageio decodes PNG) — so a SQL
    * oracle can pin both encode→container→decode roundtrips without
    * ever reading the container bytes itself. Video rows keep the UTF-8
    * text payload: the JVM genuinely ships no video codec, so that stub
    * is the honest boundary. Batch-shaped: one encoder context per
    * partition, the same execution shape every downstream codec stage
    * uses. */
  def mediaWithRealImages(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text, source) =>
          val kind = (id % 3) match {
            case 0 => "image"
            case 1 => "audio"
            case _ => "video"
          }
          val payload = kind match {
            case "image" => syntheticImagePng(id)
            case "audio" => syntheticAudioWav(id)
            case _       => text.getBytes("UTF-8")
          }
          MediaRow(id, kind, payload, source, payload.length.toLong)
        }
      }
  }

  /** Deterministic 16-bit mono PCM WAV for media id `id`: 8 kHz,
    * `400 + id % 997` samples (oracle-side arithmetic), sample i a
    * signed linear congruence of (id, i) — a real RIFF/WAVE container
    * the JDK's AudioSystem parses, hand-rolled (44-byte canonical
    * header) so the bytes are bit-deterministic across JVMs. */
  private[graft] def syntheticAudioWav(id: Long): Array[Byte] = {
    val n = (400 + id % 997).toInt
    val sampleRate = 8000
    val dataLen = n * 2
    val buf = java.nio.ByteBuffer
      .allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1.toShort) // PCM
    buf.putShort(1.toShort) // mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2) // byte rate
    buf.putShort(2.toShort) // block align
    buf.putShort(16.toShort) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      buf.putShort((((id * 31 + i.toLong * 17) % 20001) - 10000).toShort)
      i += 1
    }
    buf.array()
  }

  /** Video-row twin of [[mediaWithRealImages]]'s decodable payloads:
    * video rows (doc_id % 3 == 2) carry REAL ANIMATED GIF containers —
    * `1 + id % 7` frames of a fixed 8×6 raster — which the JDK's
    * ImageIO parses frame-by-frame. An animated GIF is the JVM-native
    * stand-in for video frame extraction: real container parsing, real
    * per-frame decode; a production ffmpeg/mp4 path swaps the reader,
    * not the stage. Kept as its OWN generator (not folded into
    * mediaWithRealImages) because m03's byte-stride frame sampling pins
    * its oracle to the text payload's byte arithmetic. */
  def gifMediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs
      .select(col("doc_id"), col("source"))
      // sequence-encode is the CPU-heavy leg (palette quantization per
      // frame); the upstream parquet scan plans far fewer splits than
      // cores, so spread the codec work before it — ids+source only,
      // a cheap exchange
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.collect {
          case (id, source) if id % 3 == 2 =>
            val payload = syntheticAnimatedGif(id)
            MediaRow(id, "video", payload, source, payload.length.toLong)
        }
      }
  }

  /** Deterministic animated GIF for media id `id`: `1 + id % 7` frames
    * of an 8×6 raster (frame f's pixels a linear congruence of
    * (id, f, x, y)), written through the JDK's GIF sequence writer. */
  private[graft] def syntheticAnimatedGif(id: Long): Array[Byte] = {
    imageIoMemCache
    val n = (1 + id % 7).toInt
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < n) {
        val img = new java.awt.image.BufferedImage(
          8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 6) {
          var x = 0
          while (x < 8) {
            val v = ((id + 7L * f + 3L * x + 11L * y) % 256).toInt
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      ios.close()
      writer.dispose()
    }
    bos.toByteArray
  }

  case class DecodedFrames(
      media_id: Long,
      n_frames: Int,
      width: Int,
      height: Int,
      ok: Boolean
  )

  /** REAL frame extraction — video rows only, batch-shaped (one reader
    * per container): parse the animation container through ImageIO's
    * frame-indexed reader, count frames and read the first frame's
    * dimensions. Unreadable bytes surface as ok = false sentinels. */
  def decodeFrames(spark: SparkSession, media: Dataset[MediaRow]): Dataset[DecodedFrames] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.collect {
        case r if r.kind == "video" =>
          realCountFrames(r.payload) match {
            case Some((n, w, h)) => DecodedFrames(r.media_id, n, w, h, ok = true)
            case None => DecodedFrames(r.media_id, -1, -1, -1, ok = false)
          }
      }
    }
  }

  /** (frameCount, width, height) via the frame-indexed GIF reader; None
    * for bytes no installed reader accepts. */
  private def realCountFrames(bytes: Array[Byte]): Option[(Int, Int, Int)] =
    try {
      imageIoMemCache
      val readers = javax.imageio.ImageIO.getImageReaders(
        javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes)))
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          if (n <= 0) None
          else Some((n, reader.getWidth(0), reader.getHeight(0)))
        } finally {
          iis.close()
          reader.dispose()
        }
      }
    } catch { case _: java.io.IOException => None }

  case class DecodedAudio(
      media_id: Long,
      sample_rate: Int,
      channels: Int,
      n_samples: Long,
      ok: Boolean
  )

  /** REAL audio decode stage — audio rows only, batch-shaped like
    * [[decodeImages]]: parse the container through javax.sound's
    * AudioSystem (format + frame count), undecodable bytes surface as
    * ok = false with sentinel fields, never a throw or a drop. */
  def decodeAudio(spark: SparkSession, media: Dataset[MediaRow]): Dataset[DecodedAudio] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (decoder handles)
      rows.collect {
        case r if r.kind == "audio" =>
          realDecodeAudio(r.payload) match {
            case Some((sr, ch, ns)) => DecodedAudio(r.media_id, sr, ch, ns, ok = true)
            case None => DecodedAudio(r.media_id, -1, 0, -1L, ok = false)
          }
      }
    }
  }

  /** (sampleRate, channels, frameLength) via AudioSystem; None for bytes
    * no installed reader accepts. */
  private def realDecodeAudio(bytes: Array[Byte]): Option[(Int, Int, Long)] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        Some((f.getSampleRate.toInt, f.getChannels, in.getFrameLength))
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** REAL audio feature: `dim` time strips over the decoded 16-bit PCM
    * samples, mean |amplitude| per strip normalized into the shared
    * closed [-0.5, 0.5] envelope (meanAbs/32768 − 0.5 — the image
    * kernel's luminance shape on the time axis). Undecodable bytes fall
    * back to the stub. */
  private def audioFeature(bytes: Array[Byte], dim: Int): Array[Float] =
    realDecodeAudio(bytes) match {
      case None => stubFeature(bytes, dim)
      case Some((_, channels, frames)) =>
        // samples sit after the 44-byte canonical header for our own
        // fixtures, but parse POSITION-INDEPENDENTLY through the stream:
        // AudioSystem hands back the raw frames regardless of header shape
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val pcm =
          try in.readAllBytes()
          finally in.close()
        val bytesPerFrame = 2 * channels
        val n = (frames.toInt min (pcm.length / bytesPerFrame)) max 0
        if (n == 0) stubFeature(bytes, dim)
        else Array.tabulate(dim) { i =>
          val from = i * n / dim
          val until = math.max(from + 1, (i + 1) * n / dim)
          var sum = 0.0
          var cnt = 0
          var j = from
          while (j < until && j < n) {
            // little-endian int16, first channel of the frame
            val lo = pcm(j * bytesPerFrame) & 0xff
            val hi = pcm(j * bytesPerFrame + 1)
            sum += math.abs((hi << 8) | lo)
            cnt += 1
            j += 1
          }
          (sum / cnt / 32768.0 - 0.5).toFloat
        }
    }

  /** Deterministic synthetic raster for media id `id`, PNG-encoded via
    * the JDK codec. Dimensions are the oracle-side arithmetic above;
    * pixel channels are small linear congruences of (id, x, y) so the
    * raster is partition-order-independent and spec-recomputable. */
  private[graft] def syntheticImagePng(id: Long): Array[Byte] = {
    imageIoMemCache
    val w = (4 + id % 13).toInt
    val h = (4 + (id / 13) % 11).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id + 7L * x + 13L * y) % 256).toInt
        val g = ((3L * id + 11L * x + 5L * y) % 256).toInt
        val b = ((5L * id + 3L * x + 17L * y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // ---------------------------------------------------------------------
  // REAL image kernels (JDK javax.imageio) + the remaining audio/video
  // stubs — deterministic fakes in place of codecs the JVM lacks.
  // ---------------------------------------------------------------------

  /** REAL image decode: PNG/JPEG/BMP/GIF through the JDK codec. None for
    * bytes no installed reader accepts (the quarantine signal — a decode
    * stage must never throw on one poisoned blob of a 100 TB corpus). */
  private def realDecodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    imageIoMemCache
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: java.io.IOException => None }
  }

  /** The default decode kernel behind [[decodeImages]]: real dimensions
    * and channel count, or the (-1, -1, 0) sentinel for undecodable
    * bytes (surfaces as ok = false, never a dropped or thrown row). */
  private def decodeImageKernel(bytes: Array[Byte]): (Int, Int, Int) =
    realDecodeImage(bytes) match {
      case Some(img) =>
        (img.getWidth, img.getHeight, img.getColorModel.getNumComponents)
      case None => (-1, -1, 0)
    }

  /** REAL image feature: `dim` vertical strips, mean luminance per strip
    * recentred to [-0.5, 0.5] — the classic cheap visual descriptor, and
    * the same closed range the audio/video stub emits so the m02 gate
    * covers every kind with one bound. Undecodable image bytes fall back
    * to the stub (deterministic, never a throw). */
  private def imageFeature(bytes: Array[Byte], dim: Int): Array[Float] =
    realDecodeImage(bytes) match {
      case None => stubFeature(bytes, dim)
      case Some(img) =>
        val w = img.getWidth
        val h = img.getHeight
        Array.tabulate(dim) { i =>
          val from = i * w / dim
          val until = math.max(from + 1, (i + 1) * w / dim)
          var sum = 0.0
          var n = 0
          var x = from
          while (x < until) {
            var y = 0
            while (y < h) {
              val p = img.getRGB(x, y)
              sum += (((p >> 16) & 255) + ((p >> 8) & 255) + (p & 255)) / (3.0 * 255)
              n += 1
              y += 1
            }
            x += 1
          }
          (sum / n - 0.5).toFloat
        }
    }

  /** REAL resize: decode, then an EXPLICIT nearest-neighbor resample
    * (src pixel = floor(dst * src / dst-extent) per axis) into a packed
    * RGB byte buffer — explicit rather than Graphics2D so the mapping is
    * hand-computable in specs and identical on every JVM. Undecodable
    * image bytes fall back to the stub byte-resample. */
  private def resizeImageKernel(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
    realDecodeImage(bytes) match {
      case None => stubResizeBytes(bytes, w * h * 3)
      case Some(img) =>
        val sw = img.getWidth
        val sh = img.getHeight
        val out = new Array[Byte](w * h * 3)
        var i = 0
        var y = 0
        while (y < h) {
          val sy = y * sh / h
          var x = 0
          while (x < w) {
            val p = img.getRGB(x * sw / w, sy)
            out(i) = ((p >> 16) & 0xff).toByte
            out(i + 1) = ((p >> 8) & 0xff).toByte
            out(i + 2) = (p & 0xff).toByte
            i += 3
            x += 1
          }
          y += 1
        }
        out
    }

  /** STUB: fake feature extractor for AUDIO/VIDEO payloads (no JVM
    * codec) — a stable pseudo-embedding from the payload bytes (in
    * reality: an audio/vision model forward pass). Also the undecodable-
    * image fallback. */
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

  /** Decode stage: batch-shaped (mapPartitions) so a codec/model is
    * initialized once per partition, not per row — the JVM equivalent of
    * `mapInPandas` batch semantics. The default kernel is the REAL JDK
    * image decode; bytes no reader accepts emit ok = false. */
  def decodeImages(spark: SparkSession, media: Dataset[MediaRow]): Dataset[DecodedImage] =
    decodeImagesWith(spark, media, decodeImageKernel)

  /** The codec SEAM: same stage, caller-supplied decode kernel
    * (bytes => (width, height, channels); non-positive dims read as
    * undecodable). The default passes the JDK imageio kernel; a
    * deployment with a faster native codec swaps one function value —
    * the plan (scan → mapPartitions → serialize) does not change. */
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
          DecodedImage(r.media_id, w, h, c, ok = w > 0 && h > 0)
      }
    }
  }

  /** Feature extraction for any media kind → fixed-dim float vector,
    * ready for the similarity-search operators (LlmOps e01/e02). IMAGE
    * rows run the real pixel-statistics kernel, AUDIO rows the real
    * PCM-amplitude kernel; video runs the stub (no JVM codec). All land
    * in the same closed [-0.5, 0.5]. */
  def extractFeatures(
      spark: SparkSession,
      media: Dataset[MediaRow],
      dim: Int = 64
  ): Dataset[MediaFeature] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val f = r.kind match {
          case "image" => imageFeature(r.payload, dim)
          case "audio" => audioFeature(r.payload, dim)
          case _       => stubFeature(r.payload, dim)
        }
        MediaFeature(r.media_id, f)
      }
    }
  }

  case class ResizedImage(
      media_id: Long,
      width: Int,
      height: Int,
      n_bytes: Long,
      payload: Array[Byte]
  )

  /** STUB byte resample to the target pixel-buffer size (w*h*3) — now
    * only the UNDECODABLE-bytes fallback of the real resize kernel
    * (deterministic in the payload, never a throw). */
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
    * fixed-size tensor shape a training loader expects. The default
    * kernel is the REAL decode + nearest-neighbor resample. */
  def resizeImages(
      spark: SparkSession,
      media: Dataset[MediaRow],
      width: Int = 32,
      height: Int = 32
  ): Dataset[ResizedImage] =
    resizeImagesWith(spark, media, width, height, resizeImageKernel)

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
