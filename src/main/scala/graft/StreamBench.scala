package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming throughput measurement — the scale evidence for the
  * streaming family (batch tiers live in BenchScale; this is their
  * micro-batch sibling). Two workloads, each fed through a REAL file
  * source (files land one at a time in a staging directory, exactly how a
  * crawler hands batches to an ingest pipeline), with per-batch rows and
  * durations taken from the StreamingQuery's own progress events:
  *
  *   - `ingest`: [[graft.streaming.EventStream.ingestGuard]] over a
  *     documents corpus — the corpus's untagged half builds the persisted
  *     dedup index, the tagged half arrives as K document batches; each
  *     batch pays fingerprinting + two index equi-joins + the staged
  *     index append. The streaming side holds ZERO state (the index is
  *     the membership), so the metric is docs/s and the check is that
  *     per-batch cost does not grow with the number of batches already
  *     ingested (the index grows, the per-batch join stays
  *     batch-linear).
  *   - `hourly`: [[graft.streaming.EventStream.hourlyStats]] over the
  *     events table split into K time-contiguous slices (watermark
  *     semantics need arrival roughly in event-time order, as a live
  *     feed delivers) — the metric is events/s plus the state store's
  *     row count per batch, which must stay bounded by the watermark
  *     horizon (windows older than watermark − delay are evicted), not
  *     grow with stream lifetime.
  *
  * Prints ONE JSON line:
  * {"metric":"stream","ingest":{"batches":[{rows,sec}...],"rows_per_s":N},
  *  "hourly":{"batches":[{rows,sec,state_rows}...],"rows_per_s":N}}
  *
  * Args: optional docs dir override (default SPARK_GRAFT_SF_DIR or
  * sf0.1; pass the BenchScale ×30 corpus dir to measure at derived
  * scale). Events always come from SPARK_GRAFT_SF_DIR (the derivation
  * does not scale events).
  */
object StreamBench {
  private case class B(rows: Long, sec: Double, stateRows: Long)

  /** Land one slice into the landing dir as ONE atomic-enough move-in:
    * write aside, then rename the part files in flat (the file source
    * lists the dir per trigger; a half-written file set would split one
    * intended batch, and a nested directory would hide from both the
    * stream lister and the schema peek). */
  private def land(spark: SparkSession, df: DataFrame, landing: String, i: Int): Unit = {
    val aside = s"$landing-aside$i"
    df.coalesce(4).write.mode("overwrite").parquet(aside)
    val fs = new org.apache.hadoop.fs.Path(landing)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(aside))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .foreach { st =>
        fs.rename(st.getPath,
          new org.apache.hadoop.fs.Path(landing, s"slice$i-${st.getPath.getName}")): Unit
      }
    fs.delete(new org.apache.hadoop.fs.Path(aside), true): Unit
  }

  /** Feed `slices` one at a time into `landing` (the first lands BEFORE
    * the query starts — the stream source needs schema-bearing files to
    * negotiate against), draining the query between slices; return
    * per-micro-batch (rows, seconds, stateRows) from the query's own
    * progress log. */
  private def drive(
      spark: SparkSession,
      slices: Seq[DataFrame],
      landing: String,
      start: String => org.apache.spark.sql.streaming.StreamingQuery
  ): Seq[B] = {
    land(spark, slices.head, landing, 0)
    val q = start(landing)
    try {
      q.processAllAvailable()
      slices.tail.zipWithIndex.foreach { case (df, i) =>
        land(spark, df, landing, i + 1)
        q.processAllAvailable()
      }
      q.recentProgress.toSeq
        .filter(_.numInputRows > 0)
        .map { p =>
          val stateRows = Option(p.stateOperators).toSeq.flatten
            .map(_.numRowsTotal).sum
          B(p.numInputRows, p.batchDuration / 1e3, stateRows)
        }
    } finally q.stop()
  }

  /** Sustained-rate variant: slice 0 lands first (the source needs
    * schema-bearing files), the query starts, and every remaining slice
    * lands CONCURRENTLY from a second thread while the query is
    * processing — continuous arrival paced by the source's
    * `maxFilesPerTrigger` backpressure, not by drain-between-slices
    * cadence (the r8 residue item: cadence-driven numbers flatter the
    * engine because no batch ever sees a backlog). Wall-clock covers
    * landing + processing overlapped, which is what a live feed pays;
    * returns the per-batch progress log plus that wall time. */
  private def driveSustained(
      spark: SparkSession,
      slices: Seq[DataFrame],
      landing: String,
      start: String => org.apache.spark.sql.streaming.StreamingQuery
  ): (Seq[B], Double) = {
    land(spark, slices.head, landing, 0)
    val t0 = System.nanoTime()
    val q = start(landing)
    val lander = new Thread(() => {
      slices.tail.zipWithIndex.foreach { case (df, i) =>
        land(spark, df, landing, i + 1)
      }
    }, "stream-bench-lander")
    lander.start()
    try {
      lander.join()
      q.processAllAvailable() // drain the backlog the lander left
      val wall = (System.nanoTime() - t0) / 1e9
      val bs = q.recentProgress.toSeq
        .filter(_.numInputRows > 0)
        .map { p =>
          val stateRows = Option(p.stateOperators).toSeq.flatten
            .map(_.numRowsTotal).sum
          B(p.numInputRows, p.batchDuration / 1e3, stateRows)
        }
      (bs, wall)
    } finally q.stop()
  }

  private def fmtSustained(bs: Seq[B], wall: Double): String = {
    val rows = bs.map(_.rows).sum
    s"""{"batches":${bs.length},"rows":$rows,"wall_s":${Bench.jnum(wall)},"rows_per_s":${Bench.jnum(rows / math.max(1e-9, wall))}}"""
  }

  private def fmt(bs: Seq[B], withState: Boolean): String = {
    val items = bs.map { b =>
      val st = if (withState) s""","state_rows":${b.stateRows}""" else ""
      s"""{"rows":${b.rows},"sec":${Bench.jnum(b.sec)}$st}"""
    }.mkString("[", ",", "]")
    val rate =
      if (bs.isEmpty) 0.0 else bs.map(_.rows).sum / math.max(1e-9, bs.map(_.sec).sum)
    s"""{"batches":$items,"rows_per_s":${Bench.jnum(rate)}}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docsDir = args.headOption.getOrElse(sfDir)
    val k = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "5").toInt
    val spark = GraftSession.builder("graft-stream-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // recentProgress is a ring buffer (default 100 entries); a sustained
    // run at maxFilesPerTrigger=4 can exceed that, silently evicting the
    // oldest batches and biasing rows/s low while wall_s still covers
    // them — size it to any batch count this harness can produce
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")
    import graft.queries.LlmOps
    import graft.streaming.EventStream

    val base = java.nio.file.Files.createTempDirectory("graft-stream-bench").toString

    // ---- ingest: index from the untagged half, arrivals in K batches ----
    val docs = Tables.documents(spark, docsDir).select("doc_id", "text")
    val isBatch = substring(md5(col("doc_id").cast("string")), 1, 1).isin("0", "1")
    val idx = s"$base/idx"
    val (h0, b0) = LlmOps.dedupIndexOf(docs.filter(!isBatch))
    LlmOps.saveDedupIndex(h0, b0, idx)
    val arrivals = docs.filter(isBatch).withColumn("__s", pmod(col("doc_id"), lit(k)))
    val docSlices = (0 until k).map(i => arrivals.filter(col("__s") === i).drop("__s"))
    val ingestLanding = s"$base/ingest-landing"
    new java.io.File(ingestLanding).mkdirs()
    val ingest = drive(spark, docSlices, ingestLanding, landing =>
      EventStream.ingestGuard(
        EventStream.readDocuments(spark, landing),
        idx, s"$base/verdicts", s"$base/ingest-ck"))
    Hygiene.release(spark)

    // ---- hourly: events in K time-contiguous slices ----
    val ev = Tables.events(spark, sfDir)
      .withColumn("ts", col("ts").cast("timestamp"))
    val bounds = ev.agg(min("ts").cast("long"), max("ts").cast("long")).head()
    val (t0, t1) = (bounds.getLong(0), bounds.getLong(1))
    val span = math.max(1L, (t1 - t0 + k) / k)
    val evSlices = (0 until k).map { i =>
      ev.filter(col("ts").cast("long") >= t0 + i * span &&
        (if (i == k - 1) lit(true) else col("ts").cast("long") < t0 + (i + 1) * span))
    }
    val hourlyLanding = s"$base/hourly-landing"
    new java.io.File(hourlyLanding).mkdirs()
    val hourly = drive(spark, evSlices, hourlyLanding, landing =>
      EventStream.hourlyStats(EventStream.readEvents(spark, landing))
        .writeStream
        .option("checkpointLocation", s"$base/hourly-ck")
        .outputMode("append")
        .format("parquet")
        .option("path", s"$base/hourly-out")
        .start())

    Hygiene.release(spark)

    // ---- contamination gate: arrivals vs the persisted train gram set ----
    val gramSet = graft.queries.LlmOps
      .gramSetOf(docs.filter(!isBatch))
      .localCheckpoint(true) // the persisted-artifact stand-in
    val contamLanding = s"$base/contam-landing"
    new java.io.File(contamLanding).mkdirs()
    val contam = drive(spark, docSlices, contamLanding, landing =>
      EventStream.contaminationStream(
        EventStream.readDocuments(spark, landing),
        gramSet, s"$base/contam-verdicts", s"$base/contam-ck"))
    Hygiene.release(spark)

    // ---- composed crawl pipeline: all three gates per batch ----
    // fresh index (the ingest run mutated idx); gram set + bigram LM from
    // the same untagged half, both as loaded artifacts; generous quality
    // bar so the measured work is the full three-gate scoring, not an
    // empty-append short-circuit
    val idx3 = s"$base/idx3"
    LlmOps.saveDedupIndex(h0, b0, idx3)
    val lmDir = s"$base/lm"
    LlmOps.saveBigramLm(
      LlmOps.bigramLmCountsOf(
        docs.filter(!isBatch).select(col("doc_id"), LlmOps.tokensCol(col("text")).as("t"))),
      lmDir)
    val lmCounts = LlmOps.loadBigramLm(spark, lmDir)
    // fresh gram set: the contam stage's localCheckpoint blocks were
    // released by the Hygiene pass above — a dead checkpoint frame fails
    // with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND, it does not recompute
    val pipeGrams = LlmOps.gramSetOf(docs.filter(!isBatch)).localCheckpoint(true)
    val pipeLanding = s"$base/pipe-landing"
    new java.io.File(pipeLanding).mkdirs()
    val pipe = drive(spark, docSlices, pipeLanding, landing =>
      EventStream.crawlPipeline(
        EventStream.readDocuments(spark, landing),
        idx3, pipeGrams, lmCounts, 1e9, s"$base/pipe-verdicts", s"$base/pipe-ck"))
    Hygiene.release(spark)

    // ---- canonical-dedup maintenance: d01's live twin over the same slices ----
    // zero stream state (the persisted store IS the dedup memory); the
    // per-batch cost is one store anti-join + the affected appends —
    // must stay batch-linear as the store grows, like ingest above
    val canonLanding = s"$base/canon-landing"
    new java.io.File(canonLanding).mkdirs()
    val canon = drive(spark, docSlices, canonLanding, landing =>
      EventStream.canonicalDedupStream(
        EventStream.readDocuments(spark, landing),
        s"$base/canon-store", s"$base/canon-verdicts", s"$base/canon-ck"))
    Hygiene.release(spark)

    // ---- sustained: continuous arrival, maxFilesPerTrigger backpressure ----
    // fresh index (the cadence run appended its arrivals into idx; scoring
    // the same docs against the mutated index would measure a different,
    // all-duplicate workload)
    val idx2 = s"$base/idx2"
    LlmOps.saveDedupIndex(h0, b0, idx2)
    val susIngestLanding = s"$base/sus-ingest-landing"
    new java.io.File(susIngestLanding).mkdirs()
    val (susIngest, susIngestWall) = driveSustained(spark, docSlices, susIngestLanding,
      landing =>
        EventStream.ingestGuard(
          EventStream.readDocuments(spark, landing, Map("maxFilesPerTrigger" -> "4")),
          idx2, s"$base/sus-verdicts", s"$base/sus-ingest-ck"))
    Hygiene.release(spark)

    val susHourlyLanding = s"$base/sus-hourly-landing"
    new java.io.File(susHourlyLanding).mkdirs()
    val (susHourly, susHourlyWall) = driveSustained(spark, evSlices, susHourlyLanding,
      landing =>
        EventStream.hourlyStats(
          EventStream.readEvents(spark, landing, Map("maxFilesPerTrigger" -> "4")))
          .writeStream
          .option("checkpointLocation", s"$base/sus-hourly-ck")
          .outputMode("append")
          .format("parquet")
          .option("path", s"$base/sus-hourly-out")
          .start())
    Hygiene.release(spark)

    // ---- IVF vector ingest: streamed appends against the frozen quantizer ----
    val embAll = Tables.embeddings(spark, docsDir).select("vec_id", "embedding")
    val embIsBatch = substring(md5(col("vec_id").cast("string")), 1, 1).isin("0", "1")
    val ivfIdx = s"$base/ivf-idx"
    graft.operators.AnnIvf.buildIndex(spark, embAll.filter(!embIsBatch), ivfIdx, nlist = 64)
    val embArrivals = embAll.filter(embIsBatch).withColumn("__s", pmod(col("vec_id"), lit(k)))
    val embSlices = (0 until k).map(i => embArrivals.filter(col("__s") === i).drop("__s"))
    val ivfLanding = s"$base/ivf-landing"
    new java.io.File(ivfLanding).mkdirs()
    val ivf = drive(spark, embSlices, ivfLanding, landing =>
      EventStream.ivfIngest(
        EventStream.readEmbeddings(spark, landing), ivfIdx, s"$base/ivf-ck"))
    Hygiene.release(spark)

    // sustained composed pipeline — the r8 SCALE table's missing cell:
    // continuous arrival against all three gates + the per-batch commit,
    // fresh index for the same reason as idx2
    val idx4 = s"$base/idx4"
    LlmOps.saveDedupIndex(h0, b0, idx4)
    val pipeGrams2 = LlmOps.gramSetOf(docs.filter(!isBatch)).localCheckpoint(true)
    val susPipeLanding = s"$base/sus-pipe-landing"
    new java.io.File(susPipeLanding).mkdirs()
    val (susPipe, susPipeWall) = driveSustained(spark, docSlices, susPipeLanding,
      landing =>
        EventStream.crawlPipeline(
          EventStream.readDocuments(spark, landing, Map("maxFilesPerTrigger" -> "4")),
          idx4, pipeGrams2, lmCounts, 1e9, s"$base/sus-pipe-verdicts", s"$base/sus-pipe-ck"))

    println(s"""{"metric":"stream","docs_dir":"$docsDir","ingest":${fmt(ingest, withState = false)},"hourly":${fmt(hourly, withState = true)},"contam":${fmt(contam, withState = false)},"pipeline":${fmt(pipe, withState = false)},"ivf_ingest":${fmt(ivf, withState = false)},"canon_dedup":${fmt(canon, withState = false)},"sustained_ingest":${fmtSustained(susIngest, susIngestWall)},"sustained_hourly":${fmtSustained(susHourly, susHourlyWall)},"sustained_pipeline":${fmtSustained(susPipe, susPipeWall)}}""")
    spark.stop()
  }
}
