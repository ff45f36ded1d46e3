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
  * full encode→PNG→decode roundtrip cross-engine). AUDIO is real too
  * (javax.sound WAV/PCM, r14), as are animated-GIF frames (ImageIO's
  * frame-indexed reader). VIDEO is real as of r15: MJPEG-in-AVI — the
  * one video codec expressible with zero dependencies, since every frame
  * is an ordinary JPEG and the AVI RIFF container is ~100 lines of
  * public-format byte arithmetic to write and walk ([[syntheticMjpegAvi]]
  * / [[parseAviFrames]] / [[sampleFrames]]). Everything rides the same
  * load-bearing plan shape: batch-shaped mapPartitions (one codec init
  * per partition, the JVM analog of a batched pandas UDF), typed output
  * columns, payloads never shuffled. Swapping MJPEG for an ffmpeg-backed
  * H.264 path changes the parse/decode function bodies, not the plan.
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

  /** Build an OPAQUE-BINARY media table from any (id, payload-ish string)
    * source — binary columns out of the driver testdata without
    * synthesizing files. Payloads here are raw text bytes (NOT decodable
    * media — content-addressed stages like m05's dedup want exactly
    * that); stages that DECODE use [[mediaWithRealImages]],
    * [[gifMediaFromDocuments]], or [[aviMediaFromDocuments]] instead. */
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
    * text payload HERE (content-addressed stages hash them); the
    * decodable video twin is [[aviMediaFromDocuments]]. Batch-shaped:
    * one encoder context per partition, the same execution shape every
    * downstream codec stage uses. */
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

  // ---- REAL video: MJPEG-in-AVI container write/parse/decode ----

  /** One RIFF chunk: fourcc + LE uint32 size + data (+ zero pad byte to
    * even length, per the RIFF spec). */
  private def riffChunk(fourcc: String, data: Array[Byte]): Array[Byte] = {
    val pad = data.length & 1
    val buf = java.nio.ByteBuffer
      .allocate(8 + data.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(fourcc.getBytes("US-ASCII")).putInt(data.length).put(data)
    buf.array() // trailing pad byte (if any) stays zero
  }

  /** A RIFF LIST chunk: `LIST` + size + listType + children. */
  private def riffList(listType: String, children: Array[Byte]*): Array[Byte] =
    riffChunk("LIST",
      listType.getBytes("US-ASCII") ++ children.flatten[Byte])

  private val AviFrameW = 16
  private val AviFrameH = 12

  /** Deterministic MJPEG-in-AVI video for media id `id`: a REAL AVI
    * container (RIFF `AVI ` with `hdrl` main+stream headers, a `movi`
    * list of `00dc` JPEG frame chunks, and an `idx1` index) holding
    * `2 + id % 6` JPEG frames of a fixed 16×12 gray raster (frame f's
    * pixel a linear congruence of (id, f, x, y)). MJPEG is the one
    * video codec expressible with zero dependencies: every frame is an
    * ordinary JPEG the JDK's ImageIO encodes/decodes, and the AVI RIFF
    * layout is a public container format (~100 lines to write + walk).
    * Frame COUNT and DIMENSIONS are pure id-arithmetic, so a SQL oracle
    * pins the full encode→AVI→parse→JPEG-decode roundtrip without
    * reading container bytes — the m01/m06/m07 pattern on the video
    * axis. */
  private[graft] def syntheticMjpegAvi(id: Long): Array[Byte] = {
    imageIoMemCache
    val n = (2 + id % 6).toInt
    val frames = (0 until n).map { f =>
      val img = new java.awt.image.BufferedImage(
        AviFrameW, AviFrameH, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < AviFrameH) {
        var x = 0
        while (x < AviFrameW) {
          val v = ((id + 5L * f + 3L * x + 7L * y) % 256).toInt
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val le = (n: Int) => java.nio.ByteBuffer.allocate(n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // avih: 56-byte main header (µs/frame, frame count, streams, dims)
    val avih = {
      val b = le(56)
      b.putInt(100000).putInt(0).putInt(0).putInt(0) // 10 fps
      b.putInt(n).putInt(0).putInt(1).putInt(0)
      b.putInt(AviFrameW).putInt(AviFrameH)
      b.array()
    }
    // strh: 56-byte video stream header, handler MJPG, rate 10/1
    val strh = {
      val b = le(56)
      b.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
      b.putInt(0).putInt(0).putInt(0)
      b.putInt(1).putInt(10).putInt(0).putInt(n) // scale, rate, start, length
      b.putInt(frames.map(_.length).max).putInt(-1).putInt(0)
      b.putShort(0.toShort).putShort(0.toShort)
        .putShort(AviFrameW.toShort).putShort(AviFrameH.toShort)
      b.array()
    }
    // strf: BITMAPINFOHEADER with biCompression = 'MJPG'
    val strf = {
      val b = le(40)
      b.putInt(40).putInt(AviFrameW).putInt(AviFrameH)
      b.putShort(1.toShort).putShort(24.toShort)
      b.put("MJPG".getBytes("US-ASCII"))
      b.putInt(AviFrameW * AviFrameH * 3).putInt(0).putInt(0).putInt(0).putInt(0)
      b.array()
    }
    val hdrl = riffList("hdrl", riffChunk("avih", avih),
      riffList("strl", riffChunk("strh", strh), riffChunk("strf", strf)))
    val frameChunks = frames.map(riffChunk("00dc", _))
    val movi = riffList("movi", frameChunks: _*)
    // idx1: one 16-byte entry per frame; offsets relative to the 'movi'
    // fourcc position, the convention most AVI muxers use
    val idx1 = {
      val b = le(16 * n)
      var off = 4 // past the 'movi' list type
      frames.indices.foreach { f =>
        b.put("00dc".getBytes("US-ASCII")).putInt(0x10) // AVIIF_KEYFRAME
        b.putInt(off).putInt(frames(f).length)
        off += frameChunks(f).length
      }
      b.array()
    }
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi ++ riffChunk("idx1", idx1)
    val out = le(8 + body.length)
    out.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
    out.array()
  }

  /** Video-row generator for the REAL frame-sampling stage: video rows
    * (doc_id % 3 == 2) carry genuine MJPEG-in-AVI containers. Same
    * repartition rationale as [[gifMediaFromDocuments]] — per-frame JPEG
    * encode is the CPU-heavy leg, spread it across cores ahead of the
    * few-split parquet scan. */
  def aviMediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs
      .select(col("doc_id"), col("source"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.collect {
          case (id, source) if id % 3 == 2 =>
            val payload = syntheticMjpegAvi(id)
            MediaRow(id, "video", payload, source, payload.length.toLong)
        }
      }
  }

  /** Walk an AVI RIFF container and return its video frame payloads
    * (`..dc`/`..db` chunks inside the `movi` list — compressed and
    * uncompressed video data respectively), in stream order. None for
    * bytes that are not a well-formed RIFF/AVI (bad magic, torn chunk,
    * size past the buffer) — sentinel, never a throw. Pure byte
    * arithmetic over public format structure; no ImageIO involved until
    * a frame is decoded. */
  private[graft] def parseAviFrames(bytes: Array[Byte]): Option[IndexedSeq[Array[Byte]]] =
    try {
      if (bytes.length < 12) return None
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(): String = {
        val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
      }
      if (fourcc() != "RIFF") return None
      val riffSize = bb.getInt
      if (fourcc() != "AVI ") return None
      val end = math.min(bytes.length.toLong, 8L + riffSize).toInt
      val frames = IndexedSeq.newBuilder[Array[Byte]]
      def walk(limit: Int, collect: Boolean): Unit =
        while (bb.position() + 8 <= limit) {
          val fc = fourcc()
          val sz = bb.getInt
          val dataEnd = bb.position() + sz
          if (sz < 0 || dataEnd > limit)
            throw new java.io.IOException(s"torn chunk $fc")
          if (fc == "LIST" && sz >= 4) {
            val lt = fourcc()
            // frame data lives in 'movi' (and its 'rec ' groupings)
            if (lt == "movi" || lt == "rec ") walk(dataEnd, collect = true)
          } else if (collect && sz >= 0 &&
              (fc.endsWith("dc") || fc.endsWith("db"))) {
            val a = new Array[Byte](sz)
            bb.get(a)
            frames += a
          }
          bb.position(dataEnd + (sz & 1)) // skip the RIFF pad byte
        }
      walk(end, collect = false)
      Some(frames.result())
    } catch {
      case _: java.io.IOException => None
      case _: java.nio.BufferUnderflowException => None
      case _: IllegalArgumentException => None // position() past limit
    }

  case class SampledFrame(
      media_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      ok: Boolean
  )

  /** REAL frame sampling — the byte-stride stub is retired: video rows
    * are parsed as AVI containers (RIFF chunk walk), every `every`-th
    * frame of the stream is selected AT ITS REAL FRAME INDEX, and each
    * selected frame's JPEG payload is decoded with the JDK codec to its
    * dimensions. flatMap shape — output cardinality is data-dependent
    * (ceil(n_frames / every) rows per video). Unparseable containers
    * surface as a single ok = false sentinel row; a parseable container
    * with an undecodable frame sentinels that FRAME only. At 100 TB the
    * shape holds: payloads never shuffle (flatMap is narrow), one codec
    * init per partition, and the sampled output carries metadata-sized
    * rows unless the caller asks for pixels. */
  def sampleFrames(
      spark: SparkSession,
      media: Dataset[MediaRow],
      every: Int = 2
  ): Dataset[SampledFrame] = {
    require(every >= 1, s"every must be >= 1, got $every")
    import spark.implicits._
    media.flatMap { r =>
      if (r.kind != "video") Iterator.empty
      else parseAviFrames(r.payload) match {
        case None =>
          Iterator.single(SampledFrame(r.media_id, -1, -1, -1, ok = false))
        case Some(chunks) =>
          chunks.iterator.zipWithIndex.collect {
            case (jpeg, i) if i % every == 0 =>
              realDecodeImage(jpeg) match {
                case Some(img) =>
                  SampledFrame(r.media_id, i, img.getWidth, img.getHeight, ok = true)
                case None => SampledFrame(r.media_id, i, -1, -1, ok = false)
              }
          }
      }
    }
  }
}
