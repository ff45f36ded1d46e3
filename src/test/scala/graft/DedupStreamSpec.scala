package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream

/** Pins canonicalDedupStream — d01's live twin: verdicts match the batch
  * kernel over a replayed prefix, the canonical store is first-arrival-
  * wins and exactly-once under replay, months-late duplicates still
  * attribute (no horizon), and a crash between store-append and
  * checkpoint advance replays to identical verdicts (the self-row
  * rule). */
class DedupStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def readVerdicts(dir: String) =
    spark.read.parquet(dir)
      .select("doc_id", "canonical_id", "verdict")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq

  private def readStore(dir: String) =
    spark.read.parquet(dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq

  test("single-batch verdicts and store match the d01 batch kernel") {
    val root = Files.createTempDirectory("graft-cds1-").toString
    val (store, out) = (s"$root/store", s"$root/verdicts")
    val rows = Seq(5L -> "aa", 9L -> "aa", 2L -> "bb", 7L -> "cc", 8L -> "cc")
    EventStream.canonicalDedupBatch(docsDf(rows), store, out, 0L)
    // batch kernel: md5-groupBy, min doc_id canonical (d01's rule)
    val batchCanon = docsDf(rows)
      .groupBy(md5(col("text")).as("content_md5"))
      .agg(min(col("doc_id")).as("canonical_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(readStore(store) == batchCanon,
      "the maintained store must equal the batch kernel's canonical set")
    val vm = readVerdicts(s"$out/batch_id=0").map(t => t._1 -> (t._2, t._3)).toMap
    assert(vm(5L) == (5L, "canonical") && vm(9L) == (5L, "duplicate"))
    assert(vm(2L) == (2L, "canonical"))
    assert(vm(7L) == (7L, "canonical") && vm(8L) == (7L, "duplicate"))
    assert(vm.size == 5)
    Hygiene.release(spark)
  }

  test("first-arrival-wins across batches; a months-late duplicate still attributes") {
    val root = Files.createTempDirectory("graft-cds2-").toString
    val (store, out) = (s"$root/store", s"$root/verdicts")
    // batch 0: doc 9 arrives FIRST with content "aa" — it is canonical
    EventStream.canonicalDedupBatch(docsDf(Seq(9L -> "aa")), store, out, 0L)
    // batch 1 (later): doc 5 with the same content — lower id, but the
    // store's canonical wins (first-arrival semantics, not global min)
    EventStream.canonicalDedupBatch(docsDf(Seq(5L -> "aa", 6L -> "dd")), store, out, 1L)
    val vm = readVerdicts(s"$out/batch_id=1").map(t => t._1 -> (t._2, t._3)).toMap
    assert(vm(5L) == (9L, "duplicate"),
      "an already-canonicalized content must attribute to the stored canonical")
    assert(vm(6L) == (6L, "canonical"))
    assert(readStore(store).map(_._2).sorted == Seq(6L, 9L))
    Hygiene.release(spark)
  }

  test("replay after crash between store-append and checkpoint is verdict-stable") {
    val root = Files.createTempDirectory("graft-cds3-").toString
    val (store, out) = (s"$root/store", s"$root/verdicts")
    val b = Seq(3L -> "xx", 4L -> "xx")
    EventStream.canonicalDedupBatch(docsDf(b), store, out, 0L)
    val v1 = readVerdicts(s"$out/batch_id=0")
    val s1 = readStore(store)
    // the crash window: store already appended, checkpoint never advanced
    // — the stream replays the SAME batch verbatim
    EventStream.canonicalDedupBatch(docsDf(b), store, out, 0L)
    assert(readVerdicts(s"$out/batch_id=0") == v1,
      "a replayed canonical must not read as a duplicate of its own store row")
    assert(readStore(store) == s1, "the replay must not double-append")
    Hygiene.release(spark)
  }

  test("a corrupt store FAILS the batch — never read as empty") {
    val root = Files.createTempDirectory("graft-cds5-").toString
    val (store, out) = (s"$root/store", s"$root/verdicts")
    EventStream.canonicalDedupBatch(docsDf(Seq(1L -> "aa")), store, out, 0L)
    // corrupt the store in place: overwrite every parquet file with junk
    // (a transient-FS / torn-footer stand-in). The old catch-all would
    // verdict doc 9 as a NEW canonical of "aa", permanently breaking
    // first-arrival-wins; the batch must instead throw and replay.
    val dir = new java.io.File(store)
    dir.listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => Files.write(f.toPath, "not parquet".getBytes))
    intercept[Exception] {
      EventStream.canonicalDedupBatch(docsDf(Seq(9L -> "aa")), store, out, 1L)
    }
    assert(!new java.io.File(s"$out/batch_id=1").exists(),
      "a failed batch must not publish verdicts")
    Hygiene.release(spark)
  }

  test("a missing store is the one admissible empty-read (first batch)") {
    val root = Files.createTempDirectory("graft-cds6-").toString
    val (store, out) = (s"$root/store", s"$root/verdicts")
    EventStream.canonicalDedupBatch(docsDf(Seq(3L -> "zz")), store, out, 0L)
    assert(readStore(store) == Seq((md5Hex("zz"), 3L)))
    Hygiene.release(spark)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("end-to-end stream wiring: restart recovery resumes from the store") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-cds4-").toString
    val (store, out, ckpt) = (s"$root/store", s"$root/verdicts", s"$root/ckpt")
    val src = MemoryStream[(Long, String)]
    val q = EventStream.canonicalDedupStream(
      src.toDF().toDF("doc_id", "text"), store, out, ckpt)
    try {
      src.addData(1L -> "aa", 2L -> "bb")
      q.processAllAvailable()
    } finally q.stop()
    // a NEW stream incarnation (fresh source, same store): the canonical
    // memory must come from the store, not lost stream state
    val src2 = MemoryStream[(Long, String)]
    val q2 = EventStream.canonicalDedupStream(
      src2.toDF().toDF("doc_id", "text"), store, out, s"$root/ckpt2")
    try {
      src2.addData(8L -> "aa")
      q2.processAllAvailable()
    } finally q2.stop()
    val all = spark.read.parquet(out)
      .select("doc_id", "canonical_id", "verdict")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1).toSeq
    assert(all.contains((8L, 1L, "duplicate")),
      "post-restart arrivals must dedup against pre-restart canonicals")
    assert(readStore(store).length == 2)
    Hygiene.release(spark)
  }
}
