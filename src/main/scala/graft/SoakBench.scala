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
  private[graft] def land(spark: SparkSession, df: DataFrame, landing: String, i: Int): Unit = {
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

  private[graft] def dirSizeKb(p: java.io.File): Long = {
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

/** The [[SoakBench]] twin for the streaming VECTOR ingest loop — the
  * r9 verdict's missing evidence: the dedup commit protocol soaked at
  * 25 batches, but [[graft.streaming.EventStream.ivfIngest]] had only a
  * 5-batch table and no in-stream rebuild exercise. This drives ≥ 25
  * streamed embedding batches through the live IVF index with BOTH
  * maintenance mutations interleaved from the single-writer process:
  *
  *   - append-compaction on the stream's own `compactEvery` cadence
  *     (collapses batch generations under the unchanged quantizer —
  *     the small-file bound between rebuilds);
  *   - a full [[graft.operators.AnnIvf.rebuildIndex]] every
  *     `rebuildEvery` batches BETWEEN micro-batches (re-trains the
  *     quantizer over the grown store — the drift-cadence maintenance a
  *     production ingest runs), after which the stream's IngestHandle
  *     must detect the new generation via its staleness probe and the
  *     `last_batch` marker must ride through (a committed replay after
  *     a rebuild stays a no-op — spec-pinned; the soak proves the cost
  *     curves too).
  *
  * Sampled after every batch: wall seconds (flat now that the commit
  * carries incremental counts — the r9 creep this soak regression-
  * guards), manifest count and vector-dir count (saw-tooth bounded by
  * the two cadences), checkpoint KB, the manifest's `rows` total and
  * `last_batch` marker. At each rebuild: recall@k of the partition-
  * pruned search against the brute-force exact top-k over the SAME
  * stored vectors — the quantizer re-train must hold recall while the
  * store grows.
  *
  * POISONED-FEED MODE (`SPARK_GRAFT_SOAK_POISON=1`): the r11 validity
  * gate has spec coverage but the clean soak never exercises it under
  * maintenance churn. With poison on, every arrival batch carries the
  * e20 malformation rule (vec_id % 23: 0 → null embedding, 1 → wrong
  * dim, 2 → null element, 3 → NaN element — ~4/23 of the feed) and the
  * stream runs with a reject ledger. (The soak's modulus is 23 where
  * e20's is 20: 23 is coprime to any realistic batch count, so the
  * vec_id % nBatches slicing interleaves malformed rows into EVERY
  * batch instead of aliasing them into the first few.) The soak then
  * also samples the
  * ledger's cumulative reject count and its directory count per batch
  * (growth must be bounded by REJECTING BATCHES, not by compactions or
  * rebuilds — maintenance must never touch the ledger), and at the end
  * asserts EXACTNESS loudly: the manifest's row total equals the
  * arithmetic count of valid feed rows + the base corpus (no malformed
  * row entered the store, no valid row was lost), and the per-reason
  * ledger totals equal the vec_id-arithmetic expectation (every parked
  * row attributable).
  *
  * Prints ONE JSON line:
  * {"metric":"ivf_soak","batches":[{batch,rows,sec,manifests,vec_dirs,
  *  ck_kb,store_rows,last_batch,recall,rejects,ledger_dirs}...],...knobs}
  *
  * Args: embeddings dir (default SPARK_GRAFT_SF_DIR or sf0.1). Env:
  * SPARK_GRAFT_SOAK_BATCHES (25), SPARK_GRAFT_SOAK_COMPACT (3),
  * SPARK_GRAFT_SOAK_REBUILD (5), SPARK_GRAFT_SOAK_NLIST (16),
  * SPARK_GRAFT_SOAK_POISON (0).
  */
object IvfSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val embDir = args.headOption.getOrElse(sfDir)
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_SOAK_BATCHES", "25").toInt
    val compactEvery = sys.env.getOrElse("SPARK_GRAFT_SOAK_COMPACT", "3").toInt
    val rebuildEvery = sys.env.getOrElse("SPARK_GRAFT_SOAK_REBUILD", "5").toInt
    val nlist = sys.env.getOrElse("SPARK_GRAFT_SOAK_NLIST", "16").toInt
    val poison = sys.env.getOrElse("SPARK_GRAFT_SOAK_POISON", "0") == "1"
    val k = 5
    val spark = GraftSession.builder("graft-ivf-soak").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")
    import graft.operators.{AnnIvf, SnapshotLog}
    import graft.streaming.EventStream

    val base = java.nio.file.Files.createTempDirectory("graft-ivf-soak").toString
    val idx = s"$base/idx"; val ck = s"$base/ck"; val landing = s"$base/landing"
    new java.io.File(landing).mkdirs()

    val emb = Tables.embeddings(spark, embDir).select("vec_id", "embedding")
    val isBatch = substring(md5(col("vec_id").cast("string")), 1, 1) < "8"
    val corpus = emb.filter(!isBatch)
    AnnIvf.buildIndex(spark, corpus, idx, nlist)
    val queries = corpus.filter(col("vec_id") < 20).localCheckpoint(true)
    // the e20 malformation rule: deterministic vec_id arithmetic, so the
    // expected ledger and the expected store size are both re-derivable
    // without trusting the ingest path under test
    val isPoisoned = col("vec_id") % 23 < 4
    val feed = emb.filter(isBatch)
    val arrivals = (if (!poison) feed
      else feed.withColumn("embedding",
        when(col("vec_id") % 23 === 0, expr("CAST(NULL AS ARRAY<FLOAT>)"))
          .when(col("vec_id") % 23 === 1, expr("slice(embedding, 1, 3)"))
          .when(col("vec_id") % 23 === 2,
            expr("transform(embedding, (v, j) -> IF(j = 0, CAST(NULL AS FLOAT), v))"))
          .when(col("vec_id") % 23 === 3,
            expr("transform(embedding, (v, j) -> IF(j = 0, CAST('NaN' AS FLOAT), v))"))
          .otherwise(col("embedding"))))
      .withColumn("__s", pmod(col("vec_id"), lit(nBatches)))
    val slices = (0 until nBatches).map(i => arrivals.filter(col("__s") === i).drop("__s"))
    val ledger = s"$base/rejects"

    def manifests = Option(new java.io.File(idx).listFiles()).toSeq.flatten
      .count(_.getName.startsWith("manifest.v"))
    def vecDirs = Option(new java.io.File(s"$idx/data/vectors").listFiles())
      .toSeq.flatten.count(_.isDirectory)
    def snapProps = SnapshotLog.current(spark, idx, "ivf-index").props

    graft.functions.VectorFunctions.register(spark)
    /** recall@k of the pruned index search vs brute force over the SAME
      * stored vectors (read through the snapshot — the store IS the
      * ground-truth corpus here). Bench-harness-only window: the store
      * at this tier is thousands of rows; the engine's own scale path
      * for this shape is the TopKVids kernel (e01). */
    def recallNow(): Double = {
      val snap = SnapshotLog.current(spark, idx, "ivf-index")
      val store = snap.dirs(idx, "vectors")
        .map(spark.read.parquet(_)).reduce(_ unionByName _)
        .select("vec_id", "embedding")
      val approx = AnnIvf.searchIndex(spark, idx, queries, k, nprobe = 4)
        .collect().groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getAs[Long]("vid")).toSet).toMap
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("cosine").desc, col("vec_id"))
      val exact = store
        .join(broadcast(queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))),
          col("vec_id") =!= col("qid"))
        .withColumn("cosine", expr("cosine_similarity(qe, embedding)"))
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
        .collect().groupBy(_.getAs[Long]("qid"))
        .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
      val rs = exact.map { case (q, truth) =>
        approx.get(q).map(a => (a & truth).size.toDouble / truth.size).getOrElse(0.0)
      }
      rs.sum / rs.size
    }

    final case class S(batch: Int, rows: Long, sec: Double, manifests: Int,
        vecDirs: Int, ckKb: Long, storeRows: Long, lastBatch: Long, recall: Option[Double],
        rejects: Long, ledgerDirs: Int)
    val samples = scala.collection.mutable.ListBuffer.empty[S]

    def rejectsNow(): Long =
      if (!poison) 0L
      else AnnIvf.rejectSummary(spark, ledger)
        .agg(coalesce(sum("rejects"), lit(0L))).collect()(0).getLong(0)
    def ledgerDirsNow(): Int =
      Option(new java.io.File(ledger).listFiles()).toSeq.flatten.count(_.isDirectory)

    SoakBench.land(spark, slices.head, landing, 0)
    val q = EventStream.ivfIngest(
      EventStream.readEmbeddings(spark, landing), idx, ck, compactEvery,
      rejectDir = if (poison) ledger else "")
    try {
      var progressSeen = 0
      for (i <- 0 until nBatches) {
        if (i > 0) SoakBench.land(spark, slices(i), landing, i)
        q.processAllAvailable()
        val ps = q.recentProgress.toSeq.filter(_.numInputRows > 0)
        val fresh = ps.drop(progressSeen)
        progressSeen = ps.length
        val (rows, sec) = fresh.lastOption
          .map(p => (p.numInputRows, p.batchDuration / 1e3)).getOrElse((0L, 0.0))
        val rebuilt = (i + 1) % rebuildEvery == 0
        // maintenance rebuild BETWEEN micro-batches (single-writer); the
        // stream's handle must pick up the new quantizer at its next probe
        if (rebuilt) AnnIvf.rebuildIndex(spark, idx, nlist)
        val p = snapProps
        samples += S(i, rows, sec, manifests, vecDirs,
          SoakBench.dirSizeKb(new java.io.File(ck)),
          p.get("rows").map(_.toLong).getOrElse(-1L),
          p.get("last_batch").map(_.toLong).getOrElse(-1L),
          if (rebuilt) Some(recallNow()) else None,
          rejectsNow(), ledgerDirsNow())
      }
    } finally q.stop()
    AnnIvf.validateIndex(spark, idx) // carried counts must reconcile cold

    if (poison) {
      // EXACTNESS, loudly: the store holds exactly base corpus + valid
      // feed rows (derived by arithmetic, not by the path under test)...
      val expectedStore = corpus.count() + feed.filter(!isPoisoned).count()
      val storeRows = snapProps.get("rows").map(_.toLong).getOrElse(-1L)
      require(storeRows == expectedStore,
        s"poisoned soak: store rows $storeRows != expected $expectedStore")
      // ...and the ledger accounts every malformed row under its reason
      val expectedByReason = feed.filter(isPoisoned)
        .groupBy((col("vec_id") % 23).cast("int").as("m")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val reasonOf = Map(0 -> "null_embedding", 1 -> "wrong_dim",
        2 -> "null_element", 3 -> "non_finite")
      val gotByReason = AnnIvf.rejectSummary(spark, ledger)
        .groupBy("reason").agg(sum("rejects").as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expected = expectedByReason.map { case (m, n) => reasonOf(m) -> n }
      require(gotByReason == expected,
        s"poisoned soak: ledger $gotByReason != expected $expected")
    }

    val items = samples.map { s =>
      val rec = s.recall.map(r => Bench.jnum(r)).getOrElse("null")
      s"""{"batch":${s.batch},"rows":${s.rows},"sec":${Bench.jnum(s.sec)},"manifests":${s.manifests},"vec_dirs":${s.vecDirs},"ck_kb":${s.ckKb},"store_rows":${s.storeRows},"last_batch":${s.lastBatch},"recall":$rec,"rejects":${s.rejects},"ledger_dirs":${s.ledgerDirs}}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"ivf_soak","emb_dir":"$embDir","compact_every":$compactEvery,"rebuild_every":$rebuildEvery,"nlist":$nlist,"poison":$poison,"batches":$items}""")
    spark.stop()
  }
}
