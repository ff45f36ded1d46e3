package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Multimodal

/** Multimodal pipeline stages surfaced as registry queries. The decode
  * kernels are deterministic stubs (no codecs in this environment — see
  * operators/Multimodal), so these are rows-only checks: they prove the
  * binary-column plumbing executes through the driver's gate, while
  * MultimodalSpec pins the determinism and schema contracts.
  */
object MMOps {

  val m01 = Q("m01_media_decode", None) { (s, d) =>
    Multimodal
      .decodeImages(s, Multimodal.mediaFromDocuments(s, Tables.documents(s, d)))
      .toDF()
      .orderBy("media_id")
  }

  val m02 = Q("m02_media_features", None) { (s, d) =>
    import s.implicits._
    Multimodal
      .extractFeatures(s, Multimodal.mediaFromDocuments(s, Tables.documents(s, d)), dim = 16)
      .map(f => (f.media_id, f.feature.length, f.feature.sum.toDouble))
      .toDF("media_id", "dim", "feature_sum")
      .orderBy("media_id")
  }

  /** Frame COUNTS are pure byte arithmetic over the deterministic media
    * mapping (kind = video iff doc_id % 3 == 2; n_bytes = UTF-8 byte
    * length), so this stage does get a DuckDB oracle even though the
    * frame payloads themselves come from the stub codec. */
  val m03 = Q(
    "m03_media_frames",
    Some("""
      SELECT doc_id AS media_id,
             GREATEST(1, CAST(CEIL(octet_length(encode(text)) / 100.0) AS BIGINT))
               AS n_frames
      FROM documents WHERE doc_id % 3 = 2 ORDER BY media_id""")
  ) { (s, d) =>
    Multimodal
      .sampleFrames(s, Multimodal.mediaFromDocuments(s, Tables.documents(s, d)), stride = 100)
      .groupByKey(_.media_id)(org.apache.spark.sql.Encoders.scalaLong)
      .count()
      .toDF("media_id", "n_frames")
      .orderBy("media_id")
  }

  /** Resize dims/sizes are deterministic arithmetic (image rows are
    * doc_id % 3 == 0; output is always width*height*3 bytes), so the
    * plumbing is hash-gated like m03 even though the pixel bytes come
    * from the stub kernel. */
  val m04 = Q(
    "m04_media_resize",
    Some("""
      SELECT doc_id AS media_id, CAST(32 AS INTEGER) AS width,
             CAST(32 AS INTEGER) AS height, CAST(3072 AS BIGINT) AS n_bytes
      FROM documents WHERE doc_id % 3 = 0 ORDER BY media_id""")
  ) { (s, d) =>
    import s.implicits._
    Multimodal
      .resizeImages(s, Multimodal.mediaFromDocuments(s, Tables.documents(s, d)))
      .map(r => (r.media_id, r.width, r.height, r.n_bytes))
      .toDF("media_id", "width", "height", "n_bytes")
      .orderBy("media_id")
  }

  val all: Seq[Q] = Seq(m01, m02, m03, m04)
}
