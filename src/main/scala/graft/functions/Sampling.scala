package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling — the reproducible way to
  * down-sample a corpus: membership depends only on the row's key (and an
  * explicit salt), so the same sample comes out on every run, any cluster
  * size, any row order, and any engine — unlike `df.sample()`, whose
  * membership depends on seed + partitioning. Reproducible subsets are
  * what make ablations and decontamination audits possible on a 100 TB
  * corpus, and a changed salt yields an independent resample.
  *
  * Mechanics: keep a row iff "0" + the first 8 hex chars of md5(salt|key)
  * compares lexicographically below floor(fraction * 16^8) rendered as
  * 9 lowercase hex digits. Same-length lowercase hex compares identically
  * to the numeric value, in Spark, DuckDB, or any engine with md5 — no
  * integer-conversion dialect differences to reconcile. The 9th digit is
  * why fraction = 1.0 is exact: its threshold "100000000" sits strictly
  * above every bucket (an 8-digit threshold would top out at "ffffffff"
  * and the strict < would silently drop rows whose bucket IS "ffffffff" —
  * ~1 in 2^32, a guaranteed loss at corpus scale). Pure projection +
  * filter: pushes to the scan, no shuffle.
  */
object Sampling {

  /** floor(fraction * 2^32) as 9 lowercase hex digits ("000000000" ..
    * "100000000"), compared against "0"-prefixed 8-digit buckets. */
  def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    f"${(fraction * 4294967296.0).toLong}%09x"
  }

  private def bucket(key: Column, salt: String): Column =
    concat(lit("0"), substring(md5(concat(lit(salt + "|"), key.cast("string"))), 1, 8))

  /** SQL twin of the membership predicate (DuckDB). */
  def predicateSql(keyExpr: String, fraction: Double, salt: String): String =
    s"'0' || substr(md5('$salt|' || CAST($keyExpr AS VARCHAR)), 1, 8) < '${thresholdHex(fraction)}'"

  /** Uniform deterministic sample: keep ~fraction of rows by key hash. */
  /** The membership predicate as a Column — for callers composing it
    * (negation, OR with other filters) instead of filtering a frame. */
  def predicate(key: Column, fraction: Double, salt: String): Column =
    bucket(key, salt) < lit(thresholdHex(fraction))

  def hashSample(df: DataFrame, key: Column, fraction: Double, salt: String = "s0"): DataFrame =
    df.filter(predicate(key, fraction, salt))

  /** Stratified deterministic sample: per-stratum fractions (strata absent
    * from the map fall back to `defaultFraction`). The per-key hash is
    * shared across strata, so changing one stratum's rate never changes
    * which rows other strata keep. */
  def hashSampleStratified(
      df: DataFrame,
      key: Column,
      stratum: Column,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0,
      salt: String = "s0"
  ): DataFrame = {
    val threshold = fractions.foldLeft(lit(thresholdHex(defaultFraction))) {
      case (acc, (k, f)) => when(stratum === k, lit(thresholdHex(f))).otherwise(acc)
    }
    df.filter(bucket(key, salt) < threshold)
  }
}
