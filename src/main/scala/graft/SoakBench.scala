package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Long soak of the composed crawl-admission pipeline — the scale
  * evidence for the COMMIT PROTOCOL itself, where StreamBench measures
  * throughput: >= 25 consecutive micro-batches through
  * [[graft.streaming.EventStream.crawlPipeline]] with index compaction
  * (+ snapshot GC) on its maintenance cadence, sampling after every
  * batch the four curves that must stay flat/bounded for the protocol
  * to survive a long-lived stream:
  *
  *   - per-batch wall seconds — flat: admission is a stream-static join
  *     against the artifact and the commit is O(dirs since compaction),
  *     so nothing may grow with stream age;
  *   - manifest count — bounded: one per commit between GCs, retired to
  *     the retention window at each compaction;
  *   - data directory count (hash + bands) — bounded: one append dir per
  *     admitting batch between compactions, collapsed to the compacted
  *     set + retained window at each compaction;
  *   - streaming state rows (from the query's own progress log) — ZERO
  *     at every batch (three stream-static joins, no stateful operator),
  *     plus checkpoint-dir bytes, which may only grow by the tiny
  *     offsets/commits log per batch (Spark compacts it on its own
  *     cadence).
  *
  * Compaction runs BETWEEN micro-batches from the same process — the
  * single-writer contract — exactly as a deployment's maintenance tick
  * would; the stream's cross-batch snapshot handle must detect each
  * compaction via its staleness probe and re-resolve (the chaos specs
  * pin correctness of that path; this harness pins that the costs stay
  * bounded over many cycles).
  *
  * Prints ONE JSON line:
  * {"metric":"soak","batches":[{batch,rows,sec,manifests,data_dirs,
  *  ck_kb,state_rows}...],"compact_every":N,"retain":1}
  *
  * Args: docs dir (default SPARK_GRAFT_SF_DIR or sf0.1). Env:
  * SPARK_GRAFT_SOAK_BATCHES (default 25), SPARK_GRAFT_SOAK_COMPACT
  * (default 5).
  */
object SoakBench {
  private def land(spark: SparkSession, df: DataFrame, landing: String, i: Int): Unit = {
    val aside = s"$landing-aside$i"
    df.coalesce(2).write.mode("overwrite").parquet(aside)
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

  private def dirSizeKb(p: java.io.File): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).toSeq.flatten.map(walk).sum
    walk(p) / 1024
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docsDir = args.headOption.getOrElse(sfDir)
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_SOAK_BATCHES", "25").toInt
    val compactEvery = sys.env.getOrElse("SPARK_GRAFT_SOAK_COMPACT", "5").toInt
    val spark = GraftSession.builder("graft-soak-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")
    import graft.queries.LlmOps
    import graft.streaming.EventStream

    val base = java.nio.file.Files.createTempDirectory("graft-soak").toString
    val idx = s"$base/idx"; val out = s"$base/verdicts"; val ck = s"$base/ck"
    val landing = s"$base/landing"
    new java.io.File(landing).mkdirs()

    val docs = Tables.documents(spark, docsDir).select("doc_id", "text")
    val isBatch = substring(md5(col("doc_id").cast("string")), 1, 1).isin("0", "1")
    val corpus = docs.filter(!isBatch)
    val (h0, b0) = LlmOps.dedupIndexOf(corpus)
    LlmOps.saveDedupIndex(h0, b0, idx)
    val grams = LlmOps.gramSetOf(corpus).localCheckpoint(true)
    val counts = LlmOps
      .bigramLmCountsOf(corpus.select(col("doc_id"), LlmOps.tokensCol(col("text")).as("t")))
      .localCheckpoint(true)
    val arrivals = docs.filter(isBatch)
      .withColumn("__s", pmod(col("doc_id"), lit(nBatches)))
    val slices = (0 until nBatches).map(i => arrivals.filter(col("__s") === i).drop("__s"))

    def manifests = Option(new java.io.File(idx).listFiles()).toSeq.flatten
      .count(_.getName.startsWith("manifest.v"))
    def dataDirs = Seq("hash", "bands")
      .map(t => Option(new java.io.File(s"$idx/data/$t").listFiles()).toSeq.flatten.count(_.isDirectory))
      .sum

    final case class S(batch: Int, rows: Long, sec: Double, manifests: Int,
        dataDirs: Int, ckKb: Long, stateRows: Long)
    val samples = scala.collection.mutable.ListBuffer.empty[S]

    land(spark, slices.head, landing, 0)
    val q = EventStream.crawlPipeline(
      EventStream.readDocuments(spark, landing), idx, grams, counts, 1e9, out, ck)
    try {
      var progressSeen = 0
      for (i <- 0 until nBatches) {
        if (i > 0) land(spark, slices(i), landing, i)
        q.processAllAvailable()
        // the batch that just ran is the newest progress entry with rows
        val ps = q.recentProgress.toSeq.filter(_.numInputRows > 0)
        val fresh = ps.drop(progressSeen)
        progressSeen = ps.length
        val (rows, sec, stateRows) = fresh.lastOption
          .map(p => (p.numInputRows, p.batchDuration / 1e3,
            Option(p.stateOperators).toSeq.flatten.map(_.numRowsTotal).sum))
          .getOrElse((0L, 0.0, 0L))
        // maintenance cadence: compact + GC between micro-batches (the
        // single-writer contract); the stream's handle must re-resolve
        if ((i + 1) % compactEvery == 0) LlmOps.compactDedupIndex(spark, idx)
        samples += S(i, rows, sec, manifests, dataDirs, dirSizeKb(new java.io.File(ck)), stateRows)
      }
    } finally q.stop()

    val items = samples.map { s =>
      s"""{"batch":${s.batch},"rows":${s.rows},"sec":${Bench.jnum(s.sec)},"manifests":${s.manifests},"data_dirs":${s.dataDirs},"ck_kb":${s.ckKb},"state_rows":${s.stateRows}}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"soak","docs_dir":"$docsDir","compact_every":$compactEvery,"batches":$items}""")
    spark.stop()
  }
}
