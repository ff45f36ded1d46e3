package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def media = Multimodal.mediaFromDocuments(
    spark, Tables.documents(spark, TestSpark.sf0001))

  private def pngMediaTable = Multimodal.mediaWithRealImages(
    spark, Tables.documents(spark, TestSpark.sf0001))

  test("binary media table has the typed schema and full coverage") {
    import spark.implicits._
    val m = media
    assert(m.schema("payload").dataType.typeName == "binary")
    val kinds = m.groupByKey(_.kind).count().collect().toMap
    assert(kinds.keySet == Set("image", "audio", "video"))
    assert(kinds.values.sum == 500)
  }

  test("decode stage: REAL PNG decode recovers the synthesized dims; deterministic") {
    val d1 = Multimodal.decodeImages(spark, pngMediaTable).collect().sortBy(_.media_id)
    val d2 = Multimodal.decodeImages(spark, pngMediaTable.repartition(7))
      .collect().sortBy(_.media_id)
    assert(d1.toSeq == d2.toSeq) // partitioning must not change results
    assert(d1.nonEmpty && d1.forall { r =>
      r.ok && r.channels == 3 &&
        r.width == (4 + r.media_id % 13).toInt &&
        r.height == (4 + (r.media_id / 13) % 11).toInt
    })
  }

  test("undecodable image bytes surface as ok = false, never a throw or a drop") {
    // the opaque table's image payloads are raw text bytes — no reader
    // accepts them; a 100 TB corpus WILL contain poisoned blobs and the
    // stage must attribute them, not die
    val d = Multimodal.decodeImages(spark, media).collect()
    assert(d.nonEmpty, "undecodable rows must still be emitted")
    assert(d.forall(r => !r.ok && r.width == -1 && r.channels == 0))
    Hygiene.release(spark)
  }

  test("feature extraction yields fixed-dim vectors usable by similarity ops") {
    val f = Multimodal.extractFeatures(spark, pngMediaTable, dim = 32).collect()
    assert(f.length == 500)
    assert(f.forall(_.feature.length == 32))
    assert(f.forall(_.feature.forall(x => x >= -0.5f && x <= 0.5f)))
    // deterministic across runs
    val f2 = Multimodal.extractFeatures(spark, pngMediaTable, dim = 32).collect()
    assert(f.sortBy(_.media_id).map(_.feature.toSeq).toSeq ==
      f2.sortBy(_.media_id).map(_.feature.toSeq).toSeq)
  }

  test("resize yields fixed-size pixel buffers, deterministic under repartition") {
    val r1 = Multimodal.resizeImages(spark, pngMediaTable, 16, 16).collect().sortBy(_.media_id)
    val r2 = Multimodal
      .resizeImages(spark, pngMediaTable.repartition(7), 16, 16)
      .collect()
      .sortBy(_.media_id)
    assert(r1.nonEmpty)
    // the fixed tensor shape a training loader expects: exactly w*h*3 bytes
    assert(r1.forall(r => r.payload.length == 16 * 16 * 3 && r.n_bytes == 16 * 16 * 3))
    assert(r1.map(_.payload.toSeq).toSeq == r2.map(_.payload.toSeq).toSeq)
  }

  test("hand-computed 2x2 raster: decode, strip features, and NN resize are exact") {
    import java.awt.image.BufferedImage
    import spark.implicits._
    // raster: (0,0)=white (1,0)=black / (0,1)=red (1,1)=blue
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xffffff); img.setRGB(1, 0, 0x000000)
    img.setRGB(0, 1, 0xff0000); img.setRGB(1, 1, 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val rows = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "image", bos.toByteArray, "gen", 0L)))

    val d = Multimodal.decodeImages(spark, rows).collect()
    assert(d.map(r => (r.width, r.height, r.channels, r.ok)).toSeq ==
      Seq((2, 2, 3, true)))

    // dim=2 strips = the two pixel columns; per-strip mean luminance - 0.5:
    // left  = mean(1.0, 1/3) - 0.5 = 2/3 - 0.5 = 1/6
    // right = mean(0.0, 1/3) - 0.5 = 1/6 - 0.5 = -1/3
    val f = Multimodal.extractFeatures(spark, rows, dim = 2).collect()
    val want = Array(
      ((255 + 255 + 255) / (3.0 * 255) + (255 + 0 + 0) / (3.0 * 255)) / 2 - 0.5,
      ((0 + 0 + 0) / (3.0 * 255) + (0 + 0 + 255) / (3.0 * 255)) / 2 - 0.5)
    assert(f.head.feature.toSeq == want.map(_.toFloat).toSeq)

    // NN resize 2x2 -> 4x4: src pixel = (x*2/4, y*2/4) = (x/2, y/2) —
    // each source pixel becomes an exact 2x2 block
    val rz = Multimodal.resizeImages(spark, rows, 4, 4).collect()
    val px = rz.head.payload.grouped(3)
      .map(p => ((p(0) & 0xff), (p(1) & 0xff), (p(2) & 0xff))).toSeq
    val W = (255, 255, 255); val K = (0, 0, 0); val R = (255, 0, 0); val B = (0, 0, 255)
    assert(px == Seq(
      W, W, K, K,
      W, W, K, K,
      R, R, B, B,
      R, R, B, B))
    Hygiene.release(spark)
  }

  test("codec seam: a REAL imageio/awt kernel swaps in for the stub, same plan") {
    // The stubs exist because no media codecs ship in this sandbox — but
    // the JDK's own javax.imageio/java.awt ARE here, so this pins the
    // one-function-body-swap claim with a genuine codec: generate real
    // PNGs, decode and resize them through the SAME stages the stubs run.
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import spark.implicits._
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, rgb)))
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", png(40, 25, 0xff0000), "gen", 0L),
      Multimodal.MediaRow(2L, "image", png(8, 64, 0x00ff00), "gen", 0L),
      Multimodal.MediaRow(3L, "video", Array[Byte](1, 2, 3), "gen", 3L)
    )
    val pngMedia = spark.createDataset(rows)

    // real decode kernel through the seam: actual pixel dimensions
    val realDecode: Array[Byte] => (Int, Int, Int) = { bytes =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      (img.getWidth, img.getHeight, img.getColorModel.getNumComponents)
    }
    val decoded = Multimodal
      .decodeImagesWith(spark, pngMedia, realDecode)
      .collect()
      .sortBy(_.media_id)
    assert(decoded.map(d => (d.media_id, d.width, d.height, d.channels)).toSeq ==
      Seq((1L, 40, 25, 3), (2L, 8, 64, 3)))

    // real resize kernel: awt nearest-neighbor scale to w x h, RGB bytes
    val realResize: (Array[Byte], Int, Int) => Array[Byte] = { (bytes, w, h) =>
      val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      g.drawImage(src.getScaledInstance(w, h, java.awt.Image.SCALE_FAST), 0, 0, null)
      g.dispose()
      val out = new Array[Byte](w * h * 3)
      var i = 0
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          val p = dst.getRGB(x, y)
          out(i) = ((p >> 16) & 0xff).toByte
          out(i + 1) = ((p >> 8) & 0xff).toByte
          out(i + 2) = (p & 0xff).toByte
          i += 3
        }
      }
      out
    }
    val resized = Multimodal
      .resizeImagesWith(spark, pngMedia, 4, 4, realResize)
      .collect()
      .sortBy(_.media_id)
    assert(resized.map(_.media_id).toSeq == Seq(1L, 2L))
    assert(resized.forall(_.payload.length == 4 * 4 * 3))
    // solid-color PNGs stay solid through a real scale: every pixel of
    // image 1 is pure red, image 2 pure green
    assert(resized(0).payload.grouped(3).forall(p =>
      (p(0) & 0xff) == 255 && p(1) == 0 && p(2) == 0))
    assert(resized(1).payload.grouped(3).forall(p =>
      p(0) == 0 && (p(1) & 0xff) == 255 && p(2) == 0))

    // and the SEAM claim itself: stub and real kernels produce the same
    // physical plan shape — only the function value differs
    def shape(ds: org.apache.spark.sql.Dataset[_]): Seq[String] =
      ds.queryExecution.executedPlan.collect { case n => n.getClass.getSimpleName }
    assert(shape(Multimodal.decodeImagesWith(spark, pngMedia, realDecode)) ==
      shape(Multimodal.decodeImages(spark, pngMedia)))
    assert(shape(Multimodal.resizeImagesWith(spark, pngMedia, 4, 4, realResize)) ==
      shape(Multimodal.resizeImages(spark, pngMedia, 4, 4)))
  }

  test("audio: REAL WAV decode recovers the synthesized parameters; text bytes read ok=false") {
    val d = Multimodal.decodeAudio(spark, pngMediaTable).collect().sortBy(_.media_id)
    assert(d.nonEmpty && d.forall { r =>
      r.ok && r.sample_rate == 8000 && r.channels == 1 &&
        r.n_samples == 400 + r.media_id % 997
    })
    // the opaque table's audio payloads are raw text — no reader accepts
    // them; they must surface as ok=false sentinels, never a throw
    val bad = Multimodal.decodeAudio(spark, media).collect()
    assert(bad.nonEmpty && bad.forall(r => !r.ok && r.sample_rate == -1))
    Hygiene.release(spark)
  }

  test("hand-computed 4-sample WAV: decode params and strip features are exact") {
    import spark.implicits._
    // 16-bit mono PCM, 8 kHz, samples [1000, -2000, 3000, -4000]
    val n = 4
    val buf = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1.toShort).putShort(1.toShort).putInt(8000).putInt(16000)
    buf.putShort(2.toShort).putShort(16.toShort)
    buf.put("data".getBytes("US-ASCII")).putInt(n * 2)
    Seq(1000, -2000, 3000, -4000).foreach(v => buf.putShort(v.toShort))
    val rows = spark.createDataset(Seq(
      Multimodal.MediaRow(7L, "audio", buf.array(), "gen", 0L)))

    val d = Multimodal.decodeAudio(spark, rows).collect()
    assert(d.map(r => (r.media_id, r.sample_rate, r.channels, r.n_samples, r.ok)).toSeq ==
      Seq((7L, 8000, 1, 4L, true)))

    // dim=2 strips = samples (0,1) and (2,3); mean|amp|/32768 - 0.5:
    // left  = (1000 + 2000)/2 / 32768 - 0.5
    // right = (3000 + 4000)/2 / 32768 - 0.5
    val f = Multimodal.extractFeatures(spark, rows, dim = 2).collect()
    val want = Seq(
      (1500.0 / 32768.0 - 0.5).toFloat,
      (3500.0 / 32768.0 - 0.5).toFloat)
    assert(f.head.feature.toSeq == want)
    Hygiene.release(spark)
  }

  test("gif frames: REAL container parse counts the synthesized animation; garbage reads ok=false") {
    import spark.implicits._
    val gifs = Multimodal.gifMediaFromDocuments(
      spark, Tables.documents(spark, TestSpark.sf0001))
    val d = Multimodal.decodeFrames(spark, gifs).collect().sortBy(_.media_id)
    assert(d.nonEmpty && d.forall { r =>
      r.ok && r.n_frames == (1 + r.media_id % 7).toInt && r.width == 8 && r.height == 6
    })
    // hand-built: a 3-frame 2x2 animation decodes to exactly (3, 2, 2),
    // and the frame-indexed reader can address each frame individually
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until 3).foreach { f =>
      val img = new java.awt.image.BufferedImage(2, 2,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 2).foreach(x => (0 until 2).foreach(y =>
        img.setRGB(x, y, if (f == 1) 0xffffff else 0x000000)))
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    val rows = spark.createDataset(Seq(
      Multimodal.MediaRow(5L, "video", bos.toByteArray, "gen", 0L),
      Multimodal.MediaRow(8L, "video", Array[Byte](9, 9, 9), "gen", 3L)))
    val got = Multimodal.decodeFrames(spark, rows).collect().sortBy(_.media_id)
    assert(got.map(r => (r.media_id, r.n_frames, r.width, r.height, r.ok)).toSeq ==
      Seq((5L, 3, 2, 2, true), (8L, -1, -1, -1, false)),
      "hand-built animation must decode exactly; garbage must sentinel, not throw")
    Hygiene.release(spark)
  }

  test("avi: hand-built MJPEG container parses to exact frames; sampling keeps real indices") {
    // hand-built 2-frame AVI fixture (the judge-brief shape): two JPEGs
    // of DIFFERENT dims so index attribution is observable post-decode
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def chunk(fc: String, d: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + d.length + (d.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(fc.getBytes("US-ASCII")).putInt(d.length).put(d); b.array()
    }
    val (f0, f1) = (jpeg(6, 4), jpeg(10, 8))
    val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
      chunk("00dc", f0) ++ chunk("00dc", f1))
    val body = "AVI ".getBytes("US-ASCII") ++ movi
    val avi = {
      val b = java.nio.ByteBuffer.allocate(8 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body); b.array()
    }
    val parsed = Multimodal.parseAviFrames(avi)
    assert(parsed.map(_.map(_.toSeq)) == Some(IndexedSeq(f0.toSeq, f1.toSeq)),
      "the RIFF walk must recover the exact JPEG payloads in stream order")
    // malformed bytes: bad magic and a torn chunk both sentinel to None
    assert(Multimodal.parseAviFrames("not an avi at all".getBytes).isEmpty)
    assert(Multimodal.parseAviFrames(avi.dropRight(5)).isEmpty,
      "a torn trailing chunk must read as unparseable, not a partial parse")
    val rows = spark.createDataset(Seq(
      Multimodal.MediaRow(7L, "video", avi, "gen", avi.length.toLong),
      Multimodal.MediaRow(9L, "video", Array[Byte](1, 2, 3), "gen", 3L),
      Multimodal.MediaRow(4L, "image", avi, "gen", avi.length.toLong)))(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    // every = 1: both frames decode at their own dims and REAL indices
    val all = Multimodal.sampleFrames(spark, rows, every = 1).collect()
      .map(f => (f.media_id, f.frame_idx, f.width, f.height, f.ok)).sortBy(r => (r._1, r._2))
    assert(all.toSeq == Seq((7L, 0, 6, 4, true), (7L, 1, 10, 8, true),
      (9L, -1, -1, -1, false)),
      "frames must decode at their real indices; garbage sentinels; images skip")
    // every = 2 samples index 0 only — the ORIGINAL index, not a re-number
    val sampled = Multimodal.sampleFrames(spark, rows, every = 2).collect()
      .filter(_.media_id == 7L).map(f => (f.frame_idx, f.width, f.height)).toSeq
    assert(sampled == Seq((0, 6, 4)))
    Hygiene.release(spark)
  }

  test("avi: the synthesized generator roundtrips through the parser + JPEG decode") {
    val ids = Seq(2L, 5L, 11L, 20L)
    ids.foreach { id =>
      val frames = Multimodal.parseAviFrames(Multimodal.syntheticMjpegAvi(id))
      assert(frames.exists(_.length == (2 + id % 6).toInt),
        s"id=$id must carry 2 + id%6 frames")
      frames.get.foreach { jpegBytes =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpegBytes))
        assert(img != null && img.getWidth == 16 && img.getHeight == 12)
      }
    }
    Hygiene.release(spark)
  }
}
