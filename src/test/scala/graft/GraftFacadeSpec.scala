package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins the public facade: every entry point a reference user would call
  * compiles against its documented signature and does its job. Guards
  * against facade rot as operators evolve underneath.
  */
class GraftFacadeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("parallel map surface: list, resources, stream, logs, jobs tables") {
    val out = Graft.remoteParallelMap(spark, 1 to 10)(_ * 2)
    assert(out.toSet == (1 to 10).map(_ * 2).toSet)
    val heavy = Graft.remoteParallelMap(
      spark, 1 to 4, resources = Graft.resources(funcCpus = 2))(_ + 1)
    assert(heavy.toSet == (2 to 5).toSet)
    assert(Graft.remoteParallelMapStream(spark, 1 to 5)(_ + 1).toSet == (2 to 6).toSet)
    val logged = Graft.remoteParallelMapStreamWithLogs(spark, 1 to 3) { x =>
      println(s"at $x"); x
    }.toSeq
    assert(logged.size == 3 && logged.forall { case (i, r, lg) =>
      r.isSuccess && lg.contains(s"at ${i + 1}")
    })
    val live = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    val relayed = Graft.remoteParallelMapLiveLogs(spark, 1 to 3) { x =>
      println(s"live $x"); x * 2
    } { (i, lg) => live.put(i, lg) }
    assert(relayed.size == 3 && live.size == 3)
    assert((0 until 3).forall(i => live.get(i.toLong).contains(s"live ${i + 1}")))
    // job history answers "what ran"
    val jobs = Graft.jobs(spark)
    assert(jobs.columns.contains("status"))
    assert(jobs.filter(col("status") === "COMPLETED").count() >= 4)
    assert(Graft.jobTransitions(spark).count() >= 8) // RUNNING + terminal each
    // usage rollup over the engine's own history
    val usage = Graft.usageDaily(spark).collect()
    assert(usage.nonEmpty && usage.forall(_.getAs[Long]("n_jobs") > 0))
  }

  test("relational extras: as-of, salted, range joins route through operators") {
    import spark.implicits._
    val left = Seq((1L, 10L, java.sql.Timestamp.valueOf("2024-01-05 00:00:00")))
      .toDF("id", "k", "t")
    val right = Seq((10L, java.sql.Timestamp.valueOf("2024-01-04 00:00:00"), 7L, 1.0))
      .toDF("rk", "rt", "payload_key", "v")
    val asof = Graft.asofJoinLatestAtOrBefore(
      left, right, "k", "rk", "t", "rt", "payload_key", Seq("payload_key", "v"))
    assert(asof.collect().head.getAs[Long]("payload_key") == 7L)

    val l2 = Seq((1L, "a"), (1L, "b")).toDF("k", "p")
    val r2 = Seq((1L, "dim")).toDF("k", "n")
    assert(Graft.saltedJoin(l2, r2, "k").count() == 2)

    val pts = Seq((1L, java.sql.Date.valueOf("2024-01-05"))).toDF("k", "d")
    val ivs = Seq((1L, java.sql.Date.valueOf("2024-01-04"), java.sql.Date.valueOf("2024-01-08")))
      .toDF("ik", "s", "e")
    assert(Graft.rangeJoinDates(pts, ivs, "k", "ik", "d", "s", "e").count() == 1)
  }

  test("ANN surface: LSH and IVF top-k over the embeddings table") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001).select("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 3)
    val lsh = Graft.annTopK(spark, emb, q, dim = 64, k = 3)
    val ivf = Graft.annTopKIvf(spark, emb, q, k = 3)
    assert(lsh.count() > 0 && ivf.count() > 0)
    assert(ivf.columns.toSeq == Seq("qid", "rnk", "vid", "cosine"))
  }

  test("streaming surface: facade passthroughs build streaming plans") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    graft.functions.VectorFunctions.register(spark)
    val evs = MemoryStream[(Long, java.sql.Timestamp, String)]
      .toDF().toDF("event_id", "ts", "text")
    assert(Graft.dedupStream(evs, Seq("text")).isStreaming)
    val corpusFps = Seq((1L, 42L)).toDF("doc_id", "simhash")
    val docs = MemoryStream[(Long, String)].toDF().toDF("doc_id", "text")
    val guard = Graft.nearDupStream(docs, corpusFps)
    assert(guard.isStreaming)
    assert(guard.columns.toSeq == Seq("doc_id", "matched_id", "hamming"))
  }

  test("curation surface: strip, fitAssign, balanced sample route through the engine") {
    val docs = Tables.documents(spark, TestSpark.sf0001).select("doc_id", "text")
    val stripped = Graft.boilerplateStrip(docs)
    assert(stripped.columns.toSeq ==
      Seq("doc_id", "n_chunks", "n_kept", "n_tokens_after", "clean_md5"))
    assert(stripped.count() > 0)
    val emb = Tables.embeddings(spark, TestSpark.sf0001).select("vec_id", "embedding")
    val (model, labels) = Graft.kMeansFitAssign(spark, emb, k = 4, iters = 1)
    assert(model.k == 4 && labels.columns.toSeq == Seq("vec_id", "cluster", "dist"))
    val bal = Graft.clusterBalancedSample(labels.select("vec_id", "cluster"))
    assert(bal.columns.toSeq == Seq("cluster", "n_vecs", "n_kept", "kept_id_sum"))
    // the smallest cluster's keep threshold is ~2^32-1: it keeps ~all rows
    val byMin = bal.orderBy(col("n_vecs")).head()
    assert(byMin.getLong(2) >= byMin.getLong(1) - 1)
  }

  test("dedup/audit surface: substring dedup, domain cap, graph rank, contamination") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val sd = Graft.substringDedup(docs)
    assert(sd.columns.toSeq == Seq("doc_id", "n_spans", "tokens_removed", "clean_md5"))
    val cap = Graft.domainCap(docs, cap = 5)
    assert(cap.groupBy("source").count().agg(max("count")).head().getLong(0) <= 5)
    val pr = Graft.dupGraphRank(
      Graft.queries("d02_dedup_minhash_lsh")(spark, TestSpark.sf0001))
    assert(pr.columns.toSeq == Seq("doc_id", "rank_units"))
    val ca = Graft.contaminationAudit(docs)
    assert(ca.columns.toSeq == Seq("doc_id", "n_grams", "n_hit", "contaminated"))
  }

  test("mixture/quality surface: gopher rules, temperature mixing, source buckets, grouped rank") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val rules = Graft.gopherRules(docs)
    assert(rules.columns.toSeq ==
      Seq("doc_id", "n_words", "ok_words", "ok_wordlen", "ok_symbols", "ok_alpha",
        "ok_bullets", "ok_ellipsis", "ok_stop", "keep"))
    assert(rules.count() == docs.count())
    val mix = Graft.temperatureMixing(docs.select("doc_id", "source", "text")).collect()
    assert(mix.nonEmpty && mix.forall(r => r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs")))
    val buckets = Graft.sourceQualityBuckets(docs.select("doc_id", "source", "text"), 4)
    assert(buckets.select("bucket").distinct().count() <= 3)
    val ranked = Graft.groupedRank(
      docs.select("doc_id", "source", "n_chars"), "source", 4, col("n_chars"), col("doc_id"))
      .withColumn("tile", Graft.ntileFromRank(col("grank"), col("gn"), 4))
    assert(ranked.filter(col("grank") > col("gn")).count() == 0)
    assert(ranked.filter(col("tile") < 1 || col("tile") > 4).count() == 0)
    Hygiene.release(spark)
  }

  test("LM + gram artifact surface: counts round-trip, scoring, live refresh") {
    val docs = Tables.documents(spark, TestSpark.sf0001).select("doc_id", "source", "text")
    val base = java.nio.file.Files.createTempDirectory("facade-lm").toString
    val counts = Graft.bigramLmCounts(docs)
    Graft.bigramLmSave(counts, s"$base/lm")
    val loaded = Graft.bigramLmLoad(spark, s"$base/lm")
    val scored = Graft.bigramNll(docs, loaded)
    assert(scored.columns.toSeq == Seq("doc_id", "n_tokens", "nll"))
    assert(scored.count() > 0)
    Graft.gramSetRefresh(docs, s"$base/grams")
    assert(Graft.gramSetLoad(spark, s"$base/grams").count() > 0)
    val verdicts = Graft.contaminationScore(docs.limit(20), Graft.gramSetLoad(spark, s"$base/grams"))
    assert(verdicts.filter(col("contaminated")).count() == 20) // scored against themselves
    Hygiene.release(spark)
  }

  test("admission stream surface: ingestGuard and crawlPipelineLive build and run") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").limit(8).as[(Long, String)].collect().toSeq
    val (corpus, batch) = docs.splitAt(4)
    val base = java.nio.file.Files.createTempDirectory("facade-stream").toString
    val (h, b) = Graft.dedupIndex(corpus.toDF("doc_id", "text"))
    Graft.dedupIndexSave(h, b, s"$base/idx")
    Graft.gramSetRefresh(corpus.toDF("doc_id", "text"), s"$base/grams")
    val counts = Graft.bigramLmCounts(
      corpus.toDF("doc_id", "text").withColumn("source", lit("s"))
        .select("doc_id", "source", "text")).localCheckpoint(true)
    val src = MemoryStream[(Long, String)]
    val q = Graft.crawlPipelineLive(
      src.toDF().toDF("doc_id", "text"), s"$base/idx", s"$base/grams", counts,
      1e9, s"$base/verdicts", s"$base/ck", true,
      graft.queries.LlmOps.UnscorablePolicy.Quarantine)
    try { src.addData(batch: _*); q.processAllAvailable() } finally q.stop()
    val v = spark.read.parquet(s"$base/verdicts")
    assert(v.count() == batch.size && v.columns.contains("verdict"))
    Hygiene.release(spark)
  }

  test("round-12 surface: piiScrub, shardManifest, writeShards, vectorRejects route through the engine") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // piiScrub is the t31 kernel
    val scrubbed = Seq("mail a@b.co from 10.0.0.1").toDF("text")
      .select(Graft.piiScrub(col("text"))).collect()(0).getString(0)
    assert(scrubbed == "mail <EMAIL> from <IP>")
    // shardManifest + writeShards agree on membership
    val docs = Tables.documents(spark, TestSpark.sf0001).select("doc_id", "n_chars")
    val manifest = Graft.shardManifest(docs)
    assert(manifest.columns.toSeq ==
      Seq("shard", "n_docs", "n_chars", "sum_doc_id", "first_key", "last_key"))
    val dir = java.nio.file.Files.createTempDirectory("facade-shards").toString + "/out"
    Graft.writeShards(docs, dir)
    val written = spark.read.parquet(dir).count()
    assert(written == docs.count())
    // vectorRejects over a missing ledger is an empty frame, not an error
    val empty = Graft.vectorRejects(spark, dir + "/no-such-ledger")
    assert(empty.columns.toSeq == Seq("batch_id", "reason", "rejects") && empty.count() == 0)
    Hygiene.release(spark)
  }

  test("storage surface: parquet round trip via the facade") {
    val dir = java.nio.file.Files.createTempDirectory("facade-io").toString + "/t"
    val df = Tables.nation(spark, TestSpark.sf0001)
    Graft.writeParquet(df, dir)
    assert(Graft.readParquet(spark, dir).count() == df.count())
  }

  test("annStructuralChecks validates a user's own top-k frame") {
    import spark.implicits._
    val queries = Seq(0L, 1L).toDF("vec_id")
    val topk = Seq((0L, 10L, 0.9), (0L, 11L, 0.8), (1L, 1L, 0.99)).toDF("qid", "vid", "cosine")
    val v = Graft.annStructuralChecks(queries, topk, k = 5).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap // no_self_ok
    assert(v(0L) && !v(1L), v.toString) // qid 1 returned itself
    Hygiene.release(spark)
  }

  test("mergeable sketch family: CMS shard blobs merge exactly; HLL union answers without rescans") {
    import spark.implicits._
    val rows = (0 until 2000).map(i => (i.toLong, s"src${i % 2}", s"key${i % 100}"))
      .toDF("id", "source", "k")
    // CMS: 4 shard blobs, merged estimate == single-pass truth bound
    val blobs = Graft.cmsShardSketches(rows, col("k"), pmod(col("id"), lit(4)))
      .select("sk").as[Array[Byte]].collect().toSeq
    assert(blobs.size == 4)
    val merged = Graft.cmsMerge(blobs)
    // every key appears 20x; CMS never undercounts and the merged grid
    // equals a single-pass build (counters are sums)
    assert((0 until 100).forall(i => merged.estimateCount(s"key$i") >= 20L))
    assert(merged.totalCount() == 2000L)
    // HLL: per-(source, shard) blobs; union answers per source
    // source = id%2 and shard = id%4 share parity: src0 only lands in
    // shards {0,2}, src1 in {1,3} -> 4 (source, shard) blobs, not 8
    val hb = Graft.hllShardSketches(rows, col("k"), pmod(col("id"), lit(4)), Seq("source"))
    assert(hb.count() == 4)
    val est = Graft.hllMergedEstimates(hb, Seq("source")).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    // each source sees keys of its parity: 50 distinct (i%2 fixes k%2... no:
    // key is i%100, source is i%2 -> source src0 sees even i -> keys i%100
    // even = 50 distinct; lgK=12 ~1.6% error, assert within 5%
    for ((_, v) <- est) assert(math.abs(v / 50.0 - 1) <= 0.05, est.toString)
    Hygiene.release(spark)
  }

  test("round-13 facade surfaces delegate to their kernels") {
    import spark.implicits._
    // mortonInterleave: bit placement
    val z = Seq((3, 1)).toDF("x", "y")
      .select(Graft.mortonInterleave(col("x"), col("y"))).collect().head.getAs[Number](0)
    assert(z.intValue == 7) // x bits at 0,2; y bit at 1
    // compactionPlan over a tiny manifest
    val plan = Graft.compactionPlan(
      Seq(("g", "a", 5L), ("g", "b", 3L)).toDF("grp", "f", "bytes"), "grp", "f", 10L)
      .collect()
    assert(plan.length == 1 && plan.head.getLong(2) == 2L && plan.head.getBoolean(5))
    // boundedPostings band + completeness
    val post = Graft.boundedPostings(
      Seq(("t", 1L), ("t", 2L), ("rare", 9L)).toDF("term", "doc_id"), 2, 64).collect()
    assert(post.length == 1 && post.head.getString(0) == "t" && post.head.getString(3) == "1,2")
    // vocabCoverage shares
    val vc = Graft.vocabCoverage(Seq("a", "a", "b").toDF("term"), 1).collect()
    assert(vc.head.getString(1) == "a" && math.abs(vc.head.getDouble(5) - 2.0 / 3) < 1e-12)
    // funnel + skewAudit on crafted frames
    val f = Graft.funnel(
      Seq((1L, "view", 1L), (1L, "click", 2L)).toDF("user_id", "event_type", "ts_s"),
      Seq("view", "click")).orderBy("stage").collect()
    assert(f.map(_.getLong(1)).toSeq == Seq(1L, 1L))
    val sk = Graft.skewAudit(Seq(1L, 1L, 2L).toDF("k"), "k", 1).collect()
    assert(sk.head.getLong(0) == 1L && sk.head.getLong(1) == 2L)
    // winsorizeStats, sourceOverlap, ivfHealth, annTopKFiltered,
    // retrievalMetrics10 ride real-data kernels spec-pinned elsewhere —
    // here just prove the facade wiring returns the kernel's shape
    val w = Graft.winsorizeStats(spark,
      (1L to 4L).map(v => ("s", v)).toDF("source", "v"), 0.25, 0.75).columns.toSeq
    assert(w == Seq("source", "n", "p_lo", "p_hi", "n_low", "n_high", "win_mean"))
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding"), col("label"))
    assert(Graft.ivfHealth(spark, emb.select("vec_id", "embedding"), 4)
      .columns.contains("imbalance"))
    val fa = Graft.annTopKFiltered(spark, emb, emb.filter(col("vec_id") < 2), "label", 3)
    assert(fa.columns.toSeq == Seq("qid", "rnk", "vid", "cosine") && fa.count() > 0)
    Hygiene.release(spark)
  }

  test("bench JSON numbers are locale-independent (dot decimal separator)") {
    // a de_DE default locale renders f"%.3f" as "1,500" — invalid JSON
    // the round driver cannot parse; jnum pins Locale.ROOT
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      assert(Bench.jnum(1.5) == "1.500")
      assert(Bench.jnum(-0.1234) == "-0.123")
      // the compact stdout renderer is locale-pinned too
      assert(Bench.jshort(0.523) == "0.52")
    } finally java.util.Locale.setDefault(prev)
  }

  test("compact stdout line values stay within the 2000-char driver window") {
    // r14/r15: the driver's 2000-char stdout tail cut the bench line's
    // opening brace and PERF came back empty — jshort bounds every
    // non-negative sub-100s value at 4 chars so the worst-case 167-entry
    // line (1916 chars with the fixed fields) fits the window.
    assert(Bench.jshort(0.523) == "0.52")
    assert(Bench.jshort(0.5) == "0.5")     // trailing zero stripped
    assert(Bench.jshort(1.449) == "1.4")
    assert(Bench.jshort(1.96) == "2")      // rounds up, dot stripped
    assert(Bench.jshort(0.996) == "1")     // band boundary: never "1.0"/"0.100"-style 5-char renders
    assert(Bench.jshort(9.96) == "10")
    assert(Bench.jshort(12.34) == "12")
    assert(Bench.jshort(0.004) == "0")
    assert(Bench.jshort(0.0) == "0")
    assert(Bench.jshort(-1.0) == "-1")     // failed-query sentinel
    for (v <- Seq(0.001, 0.09, 0.994, 0.995, 1.0, 9.94, 9.95, 42.0, 99.4))
      assert(Bench.jshort(v).length <= 4, s"jshort($v) = ${Bench.jshort(v)}")
    // parseable as JSON numbers (no bare dots, no empty strings)
    for (v <- Seq(0.0, 0.1, 0.995, 1.0, 10.0))
      assert(Bench.jshort(v).matches("-?[0-9]+(\\.[0-9]+)?"))
    assert(Bench.jsf("/root/testdata/sf0.1") == "0.1")
    assert(Bench.jsf("/root/testdata/sf1") == "1")
    assert(Bench.jsf("/data/custom") == "\"/data/custom\"")
  }
}
