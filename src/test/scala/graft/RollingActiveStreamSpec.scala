package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream

/** Pins rollingActiveStream — q50's incremental maintainer: streamed rows
  * are byte-identical to the batch kernel over the same pairs, late
  * arrivals recompute exactly the affected days, and replays are no-ops
  * (the store is exactly-once by anti-join construction). */
class RollingActiveStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev(uid: Long, day: String) =
    (uid, java.sql.Timestamp.valueOf(s"$day 12:00:00"))

  private def batchDf(rows: Seq[(Long, java.sql.Timestamp)]) = {
    import spark.implicits._
    rows.toDF("user_id", "ts")
  }

  // partition-column type inference reads `day` back as DATE — normalize
  private def readOut(dir: String) =
    spark.read.parquet(dir)
      .select(col("day").cast("string").as("day"), col("dau"), col("wau"),
        col("stickiness"))
      .orderBy("day").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq

  private def batchExpect(rows: Seq[(Long, java.sql.Timestamp)]) =
    graft.queries.Relational.rollingActive(batchDf(rows)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq

  test("maintained view equals the batch kernel; late arrivals fix old days; replay is a no-op") {
    val root = Files.createTempDirectory("graft-ras-").toString
    val (store, out) = (s"$root/store", s"$root/out")
    val b1 = Seq(ev(1, "2024-01-01"), ev(2, "2024-01-01"), ev(2, "2024-01-03"))
    EventStream.rollingActiveBatch(batchDf(b1), store, out, 7)
    assert(readOut(out) == batchExpect(b1))
    // batch 2: a LATE pair on 01-02 (inside b1's span) + a new day 01-09;
    // day 01-03's WAU must now include u3's 01-02 visit
    val b2 = Seq(ev(3, "2024-01-02"), ev(3, "2024-01-09"))
    EventStream.rollingActiveBatch(batchDf(b2), store, out, 7)
    assert(readOut(out) == batchExpect(b1 ++ b2),
      "late arrivals must recompute the days they affect")
    // replay batch 2 verbatim: anti-join adds nothing, view unchanged
    EventStream.rollingActiveBatch(batchDf(b2), store, out, 7)
    assert(readOut(out) == batchExpect(b1 ++ b2))
    assert(spark.read.parquet(store).count() == 5,
      "the distinct store must not grow on replay")
    Hygiene.release(spark)
  }

  test("untouched days' partitions are not rewritten (dynamic overwrite)") {
    val root = Files.createTempDirectory("graft-ras2-").toString
    val (store, out) = (s"$root/store", s"$root/out")
    EventStream.rollingActiveBatch(batchDf(Seq(ev(1, "2024-01-01"))), store, out, 7)
    val f = new java.io.File(s"$out/day=2024-01-01")
    val before = f.listFiles().map(x => (x.getName, x.lastModified)).toSet
    // a batch 30 days later cannot affect 01-01's row
    EventStream.rollingActiveBatch(batchDf(Seq(ev(2, "2024-02-01"))), store, out, 7)
    val after = f.listFiles().map(x => (x.getName, x.lastModified)).toSet
    assert(after == before, "a far-future batch must not rewrite old day partitions")
    assert(readOut(out).map(_._1) == Seq("2024-01-01", "2024-02-01"))
    Hygiene.release(spark)
  }

  test("crash between store-append and out-overwrite self-heals on replay") {
    val root = Files.createTempDirectory("graft-ras4-").toString
    val (store, out) = (s"$root/store", s"$root/out")
    val b1 = Seq(ev(1, "2024-01-01"), ev(2, "2024-01-03"))
    EventStream.rollingActiveBatch(batchDf(b1), store, out, 7)
    // simulate the crash window of batch 2: its pairs LANDED in the
    // store (append succeeded) but the out overwrite never ran — the
    // replayed batch's anti-join then finds nothing novel, and a
    // novel-bounded recompute would skip, leaving out stale forever
    val b2 = Seq(ev(3, "2024-01-02"))
    batchDf(b2)
      .select(col("user_id"), col("ts").cast("date").as("day"))
      .write.mode("append").parquet(store)
    val stale = readOut(out)
    assert(stale == batchExpect(b1), "precondition: out is stale")
    EventStream.rollingActiveBatch(batchDf(b2), store, out, 7)
    assert(readOut(out) == batchExpect(b1 ++ b2),
      "a replayed batch whose pairs already landed must still recompute")
    assert(spark.read.parquet(store).count() == 3,
      "the replay must not double-append the already-landed pairs")
    Hygiene.release(spark)
  }

  test("end-to-end stream wiring drives the maintainer per micro-batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-ras3-").toString
    val src = MemoryStream[(Long, java.sql.Timestamp)]
    val q = EventStream.rollingActiveStream(
      src.toDF().toDF("user_id", "ts"),
      s"$root/store", s"$root/out", s"$root/ckpt")
    try {
      src.addData(ev(1, "2024-01-01"), ev(2, "2024-01-02"))
      q.processAllAvailable()
      assert(readOut(s"$root/out") ==
        batchExpect(Seq(ev(1, "2024-01-01"), ev(2, "2024-01-02"))))
    } finally q.stop()
    Hygiene.release(spark)
  }
}
