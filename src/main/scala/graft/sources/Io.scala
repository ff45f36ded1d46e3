package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Source/sink surface. The reference's storage story is "a blob bucket
  * every worker can read/write" (SURVEY.md §2.6 S1-S3: GCS/S3 drivers +
  * a shared /workspace/shared mount; its 2.4 TB parquet example reads the
  * bucket from inside user UDFs). In Spark that capability is the
  * DataFrameReader/Writer over Hadoop FS — local paths here, s3a://gs://
  * URIs on a cluster, same code. This module adds the two layout policies
  * that matter at 100 TB:
  *
  *   - **partitioned layout** (`writePartitioned`): coarse query pruning —
  *     a filter on the partition column skips whole directories
  *     (partition pruning shows as `PartitionFilters` in the scan);
  *   - **bucketed layout** (`writeBucketed`): co-located joins — two
  *     tables bucketed on the same key join with ZERO shuffle (verified in
  *     IoSpec by asserting no Exchange in the join plan).
  */
object Io {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Hive-style partitioned parquet: one directory per partition value. */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Bucketed managed table (requires a warehouse-backed session). Joins
    * between tables bucketed identically on the join key skip the shuffle
    * entirely — the Spark analog of co-located data placement. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      nBuckets: Int,
      sortCol: Option[String] = None
  ): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** Schema-evolution read: union the schemas of every parquet footer
    * under `path` (Spark's mergeSchema) so files written before a column
    * existed read it as NULL instead of failing or silently dropping it —
    * the drift posture a years-old 100 TB lake needs, where partitions
    * span many writer versions. Merge costs one footer pass at planning
    * (per-file schema reconciliation); steady-state readers should pin
    * the canonical schema via `.schema(...)` instead and use this at the
    * boundary where drift is DISCOVERED, not assumed away. */
  def readParquetMergedSchema(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** JSONL ingest with a corrupt-record quarantine — the messy-crawl
    * front door: rows that parse against `schema` land in the first
    * frame, rows that don't (malformed JSON, type mismatches) land in
    * the second VERBATIM (the raw line, for forensics and replay after
    * a parser fix), and nothing is silently dropped — the reject-ledger
    * discipline (e20) applied to ingest. PERMISSIVE mode parses good
    * fields even when a row half-fails; a row is quarantined only when
    * the corrupt-record column is set. Both frames come from ONE read —
    * splitting is a pair of scan-pushed filters, not a second pass. */
  def readJsonlQuarantined(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType
  ): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains("_corrupt_record"),
      "schema must not already define _corrupt_record")
    val withCorrupt = schema.add("_corrupt_record", "string")
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      // Spark forbids filtering ONLY the corrupt column off a lazy json
      // scan (SPARK-26745), so the parse must be materialized before the
      // split; an EAGER localCheckpoint (not .cache()) does it with
      // blocks the ContextCleaner evicts once the caller drops the
      // returned frames — an explicit cache would pin one parsed-corpus
      // copy per call for the session lifetime in a many-file ingest
      // service. Also makes the two halves one parse instead of two.
      // Cluster caveat: localCheckpoint TRUNCATES lineage, so losing an
      // executor that held checkpoint blocks fails the job permanently
      // (a cache would recompute from the JSON scan). Fine in local
      // mode and for one-shot ingest batches that fail-and-replay; a
      // long-lived cluster service that must survive executor loss
      // should instead cache, consume both halves, and unpersist.
      .localCheckpoint(true)
    val good = raw.filter(raw("_corrupt_record").isNull).drop("_corrupt_record")
    val bad = raw.filter(raw("_corrupt_record").isNotNull)
      .select(raw("_corrupt_record").as("raw_line"))
    (good, bad)
  }

  /** Z-ordered parquet layout (q44's write): rows are clustered by the
    * Morton interleave of two 8-bit dimensions (xCol & 255, yCol & 255),
    * files are contiguous z-ranges (one dir per top interleaved byte),
    * and rows inside each file are z-sorted. Per-file min/max zone maps
    * come out tight on BOTH dimensions simultaneously — a reader prunes
    * on either predicate column, which a single-sort-key layout only
    * gives for its own key (LayoutSpec measures both claims on disk).
    * One range-style shuffle (repartition by bucket), no driver data. */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      xCol: String,
      yCol: String
  ): Unit = {
    import org.apache.spark.sql.functions._
    val z = graft.queries.Relational.morton8(
      col(xCol).bitwiseAND(255), col(yCol).bitwiseAND(255))
    df.withColumn("__z", z)
      .withColumn("__zbucket", shiftright(org.apache.spark.sql.functions.col("__z"), 12))
      .repartition(col("__zbucket"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).partitionBy("__zbucket").parquet(path)
  }
}
