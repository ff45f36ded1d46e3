package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Validation manifest for every persisted index artifact (KMeans models,
  * IVF centroid sets, PQ codebooks, dedup hash/band indexes). Before this
  * existed, a loaded artifact was trusted blind: a truncated copy, a
  * hand-edited table, an artifact from a different build, or a directory
  * of the wrong index family all loaded silently and produced wrong
  * results downstream (worst case: a dedup index missing band rows admits
  * near-duplicates into a training corpus with no error anywhere).
  *
  * The manifest is a tiny `_graft_manifest` properties file INSIDE the
  * artifact directory (the `_` prefix keeps every parquet reader from
  * treating it as data, same as `_SUCCESS`). It records:
  *   - `format_version` — layout revision of the artifact family;
  *   - `kind` — which family this directory is (loading a KMeans path as
  *     an IVF set fails on kind, not on a shape coincidence);
  *   - structural params (k / nlist / subspaces / sub_dim / bands...) —
  *     verified against the loaded content, not just echoed;
  *   - per-table physical row counts — parquet-footer-metadata counts,
  *     cheap at any scale, catching truncated or partially-written tables.
  *
  * WRITE ORDER: data files first, manifest LAST. The manifest doubles as
  * the artifact's commit marker — a save that crashes mid-write leaves no
  * manifest, and the next load fails loudly with [[ArtifactManifest.Missing]]
  * instead of consuming a half-written index. Mutators that legitimately
  * change row counts (dedup-index append/compact) rewrite the manifest
  * after the data mutation, under the same discipline.
  */
object ArtifactManifest {
  val FormatVersion = 1
  private val FileName = "_graft_manifest"

  /** A loaded artifact contradicts its manifest (or the caller's
    * expectation of what lives at `path`). */
  final case class Mismatch(path: String, field: String, expected: String, found: String)
      extends IllegalStateException(
        s"index artifact at $path failed validation: $field expected $expected, found $found"
      )

  /** No manifest at `path`: the artifact predates manifests, was written
    * by something else, or its save crashed before commit. */
  final case class Missing(path: String)
      extends IllegalStateException(
        s"no $FileName at $path — artifact is unversioned, foreign, or from an interrupted save; refusing to load it blind"
      )

  /** Write (or overwrite) the manifest for the artifact rooted at `dir`.
    * Call AFTER every data file is committed. */
  def write(spark: SparkSession, dir: String, kind: String, fields: Map[String, String]): Unit = {
    val all = fields ++ Map("format_version" -> FormatVersion.toString, "kind" -> kind)
    val body = all.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString("", "\n", "\n")
    val p = new Path(dir, FileName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(body.getBytes("UTF-8"))
    finally out.close()
  }

  /** Read the manifest and check `format_version` + `kind`; returns the
    * field map for the caller's structural checks. */
  def readAndCheck(spark: SparkSession, dir: String, kind: String): Map[String, String] = {
    val p = new Path(dir, FileName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) throw Missing(dir)
    val in = fs.open(p)
    val bytes =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](4096)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        buf.toByteArray
      } finally in.close()
    val fields = new String(bytes, "UTF-8").linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && l.contains('='))
      .map { l => val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1) }
      .toMap
    check(dir, "format_version", FormatVersion.toString, fields.getOrElse("format_version", "?"))
    check(dir, "kind", kind, fields.getOrElse("kind", "?"))
    fields
  }

  /** Structural assertion helper: typed Mismatch instead of a bare require. */
  def check(path: String, field: String, expected: String, found: String): Unit =
    if (expected != found) throw Mismatch(path, field, expected, found)

  /** Physical row count of one parquet table under the artifact — a
    * footer-metadata aggregate, cheap at any scale. */
  def tableRows(spark: SparkSession, dir: String): Long =
    spark.read.parquet(dir).count()
}
