package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def media = Multimodal.mediaFromDocuments(
    spark, Tables.documents(spark, TestSpark.sf0001))

  test("binary media table has the typed schema and full coverage") {
    import spark.implicits._
    val m = media
    assert(m.schema("payload").dataType.typeName == "binary")
    val kinds = m.groupByKey(_.kind).count().collect().toMap
    assert(kinds.keySet == Set("image", "audio", "video"))
    assert(kinds.values.sum == 500)
  }

  test("decode stage is deterministic, image-only, batch-shaped") {
    val d1 = Multimodal.decodeImages(spark, media).collect().sortBy(_.media_id)
    val d2 = Multimodal.decodeImages(spark, media.repartition(7)).collect().sortBy(_.media_id)
    assert(d1.toSeq == d2.toSeq) // partitioning must not change results
    assert(d1.nonEmpty && d1.forall(r => r.ok && r.width >= 64 && r.channels == 3))
  }

  test("feature extraction yields fixed-dim vectors usable by similarity ops") {
    val f = Multimodal.extractFeatures(spark, media, dim = 32).collect()
    assert(f.length == 500)
    assert(f.forall(_.feature.length == 32))
    // deterministic across runs
    val f2 = Multimodal.extractFeatures(spark, media, dim = 32).collect()
    assert(f.sortBy(_.media_id).map(_.feature.toSeq).toSeq ==
      f2.sortBy(_.media_id).map(_.feature.toSeq).toSeq)
  }

  test("resize yields fixed-size pixel buffers, deterministic under repartition") {
    val r1 = Multimodal.resizeImages(spark, media, 16, 16).collect().sortBy(_.media_id)
    val r2 = Multimodal
      .resizeImages(spark, media.repartition(7), 16, 16)
      .collect()
      .sortBy(_.media_id)
    assert(r1.nonEmpty)
    // the fixed tensor shape a training loader expects: exactly w*h*3 bytes
    assert(r1.forall(r => r.payload.length == 16 * 16 * 3 && r.n_bytes == 16 * 16 * 3))
    assert(r1.map(_.payload.toSeq).toSeq == r2.map(_.payload.toSeq).toSeq)
  }

  test("frame sampling flatMaps videos into stride-sized frames") {
    val frames = Multimodal.sampleFrames(spark, media, stride = 100).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame.length <= 100))
    val perVideo = frames.groupBy(_.media_id)
    perVideo.values.foreach { fs =>
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until fs.length))
    }
  }
}
