package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated star schema (TESTDATA.md).
  *
  * One quirk: `events.ts` is parquet TIMESTAMP(NANOS) which Spark cannot
  * represent natively. We read it as a long (nanosAsLong) and convert to a
  * microsecond TimestampType column via exact integer division — a plain
  * double division would lose precision above 2^53 ns (~1970+104 days).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `documents` contract: `doc_id` is UNIQUE (one row per document).
    * Per-row kernels (d04's SimHash projection, t01-t05 text stats) and
    * their GROUP BY doc_id oracle twins are only equivalent under this
    * invariant; `QueriesSmokeSpec` asserts it against the testdata. A
    * corpus with duplicate doc_id rows must be deduplicated upstream
    * (d01 exact dedup is the tool) before these operators apply. */
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** events with `ts` as a proper TimestampType (µs), whatever the file had. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // FLOOR division, not `div`: div truncates toward zero, so a
        // pre-1970 nanosecond timestamp would round UP a microsecond —
        // e.g. -500 ns must floor to -1 us, not 0 (the boundary a
        // `<= ts` comparison flips on). pmod is non-negative, making
        // (ts - pmod) an exact long floor.
        raw.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case _ => raw
    }
  }
}
