package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream

/** Pins transitionStream — q53's streaming twin: exactly-once finalized
  * pairs, out-of-order insertion WITHIN the watermark horizon, the
  * cross-gap pair through lastFinal, and count parity with the batch
  * transitionMatrix on the real events table. */
class TransitionStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev(id: Long, uid: Long, epochS: Long, typ: String) =
    EventStream.Event(id, new java.sql.Timestamp(epochS * 1000), uid, typ, 1.0)

  test("an on-time out-of-order arrival inserts between two buffered events") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[EventStream.Event]
    // batch 1: a@10000, c@10200 — nothing final (wm lags)
    src.addData(ev(1, 1, 10000, "a"), ev(2, 1, 10200, "c"))
    val q = EventStream.transitionStream(spark, src.toDS())
      .writeStream.outputMode("append").format("memory").queryName("ts1").start()
    try {
      q.processAllAvailable()
      assert(spark.table("ts1").isEmpty, "nothing may finalize above the watermark")
      // batch 2: b@10100 is on time and lands BETWEEN a and c
      src.addData(ev(3, 1, 10100, "b"))
      q.processAllAvailable()
      src.addData(ev(9, 99, 999999, "x")) // watermark past everything
      q.processAllAvailable()
      val got = spark.table("ts1").as[EventStream.TransitionHit].collect()
        .filter(_.user_id == 1)
        .map(h => (h.from_type, h.to_type)).toSeq
      assert(got == Seq(("a", "b"), ("b", "c")),
        s"arrival order must not decide adjacency: $got")
    } finally q.stop()
  }

  test("equal timestamps break on event_id; a returning user pairs across the gap") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[EventStream.Event]
    src.addData(ev(2, 1, 10000, "b"), ev(1, 1, 10000, "a"))
    val q = EventStream.transitionStream(spark, src.toDS())
      .writeStream.outputMode("append").format("memory").queryName("ts2").start()
    try {
      q.processAllAvailable()
      src.addData(ev(3, 1, 50000, "c")) // wm passes 10000: (a,b) finalizes
      q.processAllAvailable()
      src.addData(ev(9, 99, 999999, "x")) // wm passes 50000: (b,c) through lastFinal
      q.processAllAvailable()
      val got = spark.table("ts2").as[EventStream.TransitionHit].collect()
        .filter(_.user_id == 1)
        .sortBy(h => (h.from_s, h.to_s)).map(h => (h.from_type, h.to_type)).toSeq
      assert(got == Seq(("a", "b"), ("b", "c")), s"got $got")
    } finally q.stop()
  }

  test("batch parity: streamed pair counts equal the batch transition matrix at sf0.001") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.events(spark, TestSpark.sf001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventStream.Event].collect()
    // shuffle deterministically so arrival order differs from event time
    val shuffled = events.sortBy(e => e.event_id * 2654435761L % 1000003)
    val src = MemoryStream[EventStream.Event]
    // a horizon wider than the table's whole span: the shuffled feed has
    // arbitrary disorder, and parity is about ORDERING, not lateness
    val q = EventStream.transitionStream(spark, src.toDS(), watermarkSeconds = 2000000000L)
      .writeStream.outputMode("append").format("memory").queryName("ts3").start()
    try {
      shuffled.grouped(250).foreach { g => src.addData(g.toSeq); q.processAllAvailable() }
      src.addData(ev(999999999L, 999999L, 4102444800L, "x")) // wm past everything
      q.processAllAvailable()
      val streamed = spark.table("ts3").as[EventStream.TransitionHit].collect()
        .filter(_.user_id != 999999L)
        .groupBy(h => (h.from_type, h.to_type)).view.mapValues(_.length.toLong).toMap
      val batch = graft.queries.Relational
        .transitionMatrix(Tables.events(spark, TestSpark.sf001))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch, "streamed exactly-once pairs must reproduce the batch matrix")
    } finally q.stop()
  }
}
