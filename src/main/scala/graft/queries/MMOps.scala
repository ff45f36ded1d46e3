package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Multimodal

/** Multimodal pipeline stages surfaced as registry queries. IMAGE stages
  * are REAL end-to-end (r14): [[Multimodal.mediaWithRealImages]]
  * synthesizes genuine PNG payloads whose dimensions are pure
  * id-arithmetic, and the stages decode them with the JDK codec — so
  * m01's oracle pins the full encode→PNG→decode roundtrip value-by-value
  * (DuckDB recomputes the dimensions from doc_id without ever reading a
  * PNG). Audio (m06, javax.sound WAV), animated GIF (m07, frame-indexed
  * ImageIO), and video (m03, MJPEG-in-AVI RIFF walk + per-frame JPEG
  * decode — r15) are real as well; every codec family now runs a genuine
  * encode→container→decode roundtrip whose parameters are pure
  * id-arithmetic the oracle replays, while MultimodalSpec pins exact
  * values and schema contracts on hand-built fixtures.
  */
object MMOps {

  /** Decode-stage gate: the REAL roundtrip — image rows (doc_id%3==0)
    * carry synthesized PNGs of width 4 + id%13, height 4 + (id/13)%11;
    * the JDK decoder must recover exactly those dims (and 3 channels)
    * from the bytes, and the oracle recomputes them arithmetically. */
  val m01 = Q(
    "m01_media_decode",
    Some("""
      SELECT doc_id AS media_id,
             CAST(4 + doc_id % 13 AS INTEGER) AS width,
             CAST(4 + (doc_id // 13) % 11 AS INTEGER) AS height,
             CAST(3 AS INTEGER) AS channels, TRUE AS ok
      FROM documents WHERE doc_id % 3 = 0 ORDER BY media_id""")
  ) { (s, d) =>
    Multimodal
      .decodeImages(s, Multimodal.mediaWithRealImages(s, Tables.documents(s, d)))
      .toDF()
      .select(col("media_id"), col("width"), col("height"), col("channels"), col("ok"))
      .orderBy("media_id")
  }

  /** Feature-stage gate: every media row gets a dim-16 embedding — image
    * rows from REAL pixel statistics (per-strip mean luminance, recentred),
    * audio/video from the stub — all elements in the shared [-0.5, 0.5]
    * range. The interval is CLOSED on both ends: the stub's
    * (h & 0xffff)/65535 reaches exactly 1.0 when a hash step lands on
    * 0xffff, so 0.5 is attainable (about one element in 65536 — doc_ids
    * 1364 and 3213 hit it at sf0.1; an exclusive upper-bound check failed
    * exactly those rows against the oracle's hardcoded TRUE), and an
    * all-black raster's luminance mean is exactly -0.5. */
  val m02 = Q(
    "m02_media_features",
    Some("""
      SELECT doc_id AS media_id, CAST(16 AS INTEGER) AS dim, TRUE AS range_ok
      FROM documents ORDER BY media_id""")
  ) { (s, d) =>
    import s.implicits._
    Multimodal
      .extractFeatures(s, Multimodal.mediaWithRealImages(s, Tables.documents(s, d)), dim = 16)
      .map(f =>
        (f.media_id, f.feature.length, f.feature.forall(x => x >= -0.5f && x <= 0.5f))
      )
      .toDF("media_id", "dim", "range_ok")
      .orderBy("media_id")
  }

  /** Frame-sampling gate (m03) — REAL video as of r15, the byte-stride
    * stub retired: video rows carry synthesized MJPEG-in-AVI containers
    * of `2 + id % 6` JPEG frames (16×12); the stage walks the RIFF
    * container, samples every 2nd frame AT ITS REAL FRAME INDEX, and
    * JPEG-decodes each sampled frame to its dimensions. The oracle
    * replays the sampled index set and dims arithmetically (frame
    * indices 0, 2, 4, … below the count — the m01/m06/m07 roundtrip
    * pattern on the video axis). */
  val m03 = Q(
    "m03_media_frames",
    Some("""
      SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame_idx,
             CAST(16 AS INTEGER) AS width, CAST(12 AS INTEGER) AS height,
             TRUE AS ok
      FROM documents, UNNEST(range(0, 2 + doc_id % 6, 2)) AS t(f)
      WHERE doc_id % 3 = 2 ORDER BY media_id, frame_idx""")
  ) { (s, d) =>
    Multimodal
      .sampleFrames(s, Multimodal.aviMediaFromDocuments(s, Tables.documents(s, d)), every = 2)
      .toDF()
      .select(col("media_id"), col("frame_idx"), col("width"), col("height"), col("ok"))
      .orderBy("media_id", "frame_idx")
  }

  /** Resize-stage gate: REAL decode + nearest-neighbor resample of the
    * synthesized PNGs to the fixed 32×32×3 tensor shape. The oracle pins
    * row membership and the output tensor shape (the SQL-expressible
    * surface); MultimodalSpec pins the resample's exact pixel mapping on
    * a hand-computed raster. */
  val m04 = Q(
    "m04_media_resize",
    Some("""
      SELECT doc_id AS media_id, CAST(32 AS INTEGER) AS width,
             CAST(32 AS INTEGER) AS height, CAST(3072 AS BIGINT) AS n_bytes
      FROM documents WHERE doc_id % 3 = 0 ORDER BY media_id""")
  ) { (s, d) =>
    import s.implicits._
    Multimodal
      .resizeImages(s, Multimodal.mediaWithRealImages(s, Tables.documents(s, d)))
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

  /** Audio-decode gate (m06): the REAL roundtrip for sound — audio rows
    * (doc_id%3==1) carry synthesized 16-bit mono PCM WAV with
    * `n_samples = 400 + id % 997` at 8 kHz; the JDK's AudioSystem must
    * recover exactly those parameters from the container bytes, and the
    * oracle recomputes them arithmetically (the m01 pattern on the time
    * axis). */
  val m06 = Q(
    "m06_audio_decode",
    Some("""
      SELECT doc_id AS media_id, CAST(8000 AS INTEGER) AS sample_rate,
             CAST(1 AS INTEGER) AS channels,
             CAST(400 + doc_id % 997 AS BIGINT) AS n_samples, TRUE AS ok
      FROM documents WHERE doc_id % 3 = 1 ORDER BY media_id""")
  ) { (s, d) =>
    Multimodal
      .decodeAudio(s, Multimodal.mediaWithRealImages(s, Tables.documents(s, d)))
      .toDF()
      .select(col("media_id"), col("sample_rate"), col("channels"),
        col("n_samples"), col("ok"))
      .orderBy("media_id")
  }

  /** Animation-frame gate (m07): REAL container-parsed frame extraction
    * — video rows carry synthesized animated GIFs of `1 + id % 7` 8×6
    * frames; ImageIO's frame-indexed reader must recover exactly those
    * counts and dims from the container bytes (the m01/m06 roundtrip
    * pattern on the frame axis). m03 is the AVI-container twin with
    * frame SAMPLING on top; this is the whole-animation count path. */
  val m07 = Q(
    "m07_gif_frames",
    Some("""
      SELECT doc_id AS media_id, CAST(1 + doc_id % 7 AS INTEGER) AS n_frames,
             CAST(8 AS INTEGER) AS width, CAST(6 AS INTEGER) AS height, TRUE AS ok
      FROM documents WHERE doc_id % 3 = 2 ORDER BY media_id""")
  ) { (s, d) =>
    Multimodal
      .decodeFrames(s, Multimodal.gifMediaFromDocuments(s, Tables.documents(s, d)))
      .toDF()
      .select(col("media_id"), col("n_frames"), col("width"), col("height"), col("ok"))
      .orderBy("media_id")
  }

  val all: Seq[Q] = Seq(m01, m02, m03, m04, m05, m06, m07)
}
