package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Multimodal

/** Multimodal pipeline stages surfaced as registry queries. The decode
  * kernels are deterministic stubs (no codecs in this environment — see
  * operators/Multimodal), so stub-DERIVED values (pixel dims, feature
  * floats) can't be recomputed by the oracle; instead every stage emits
  * deterministic assertion columns over the stub's CONTRACT (row
  * membership, kind routing, dims/dim/range bounds) that DuckDB pins
  * row-by-row — the e08/q28 gating pattern — while MultimodalSpec pins
  * the exact values' determinism and schema contracts.
  */
object MMOps {

  /** Decode-stage gate: which rows decode (image rows = doc_id%3==0),
    * with dims inside the stub's documented [64, 576) envelope and
    * channels fixed — hash-checked per row. */
  val m01 = Q(
    "m01_media_decode",
    Some("""
      SELECT doc_id AS media_id, TRUE AS dims_ok,
             CAST(3 AS INTEGER) AS channels, TRUE AS ok
      FROM documents WHERE doc_id % 3 = 0 ORDER BY media_id""")
  ) { (s, d) =>
    Multimodal
      .decodeImages(s, Multimodal.mediaFromDocuments(s, Tables.documents(s, d)))
      .toDF()
      .select(
        col("media_id"),
        (col("width").between(64, 575) && col("height").between(64, 575))
          .as("dims_ok"),
        col("channels"),
        col("ok")
      )
      .orderBy("media_id")
  }

  /** Feature-stage gate: every media row gets a dim-16 pseudo-embedding
    * with all elements in the stub's [-0.5, 0.5] range. The interval is
    * CLOSED on both ends: (h & 0xffff)/65535 reaches exactly 1.0 when a
    * hash step lands on 0xffff, so 0.5 is attainable (about one element
    * in 65536 — doc_ids 1364 and 3213 hit it at sf0.1; an exclusive
    * upper-bound check failed exactly those rows against the oracle's
    * hardcoded TRUE). */
  val m02 = Q(
    "m02_media_features",
    Some("""
      SELECT doc_id AS media_id, CAST(16 AS INTEGER) AS dim, TRUE AS range_ok
      FROM documents ORDER BY media_id""")
  ) { (s, d) =>
    import s.implicits._
    Multimodal
      .extractFeatures(s, Multimodal.mediaFromDocuments(s, Tables.documents(s, d)), dim = 16)
      .map(f =>
        (f.media_id, f.feature.length, f.feature.forall(x => x >= -0.5f && x <= 0.5f))
      )
      .toDF("media_id", "dim", "range_ok")
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

  /** Exact media dedup by BINARY content digest — d01's shape on the
    * payload column (the first pass any multimodal corpus ingest runs:
    * identical bytes, one canonical copy). The digest is computed in the
    * scan projection, so only 16-byte hashes ever shuffle — at 100 TB of
    * media the exchange carries digests + ids, never payloads. Per
    * distinct payload: copy count and canonical (min) id — oracle-
    * recomputable because the stub media payload is the UTF-8 encoding of
    * the text column, and DuckDB's md5(VARCHAR) hashes exactly those
    * bytes (its md5 has no BLOB overload). */
  val m05 = Q(
    "m05_media_dedup",
    Some("""
      SELECT md5(text) AS content_md5,
             CAST(COUNT(*) AS BIGINT) AS n_copies,
             MIN(doc_id) AS canonical_id
      FROM documents GROUP BY 1 ORDER BY canonical_id""")
  ) { (s, d) =>
    Multimodal
      .mediaFromDocuments(s, Tables.documents(s, d))
      .toDF()
      .select(md5(col("payload")).as("content_md5"), col("media_id"))
      .groupBy("content_md5")
      .agg(count(lit(1)).as("n_copies"), min(col("media_id")).as("canonical_id"))
      .orderBy("canonical_id")
  }

  val all: Seq[Q] = Seq(m01, m02, m03, m04, m05)
}
