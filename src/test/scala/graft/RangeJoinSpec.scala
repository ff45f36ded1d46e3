package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("granule-bucketed interval join equals the naive inequality join") {
    val ev = Tables
      .events(spark, TestSpark.sf0001)
      .select(col("user_id"), to_date(col("ts")).as("event_date"), col("event_id"))
    val win = Tables
      .events(spark, TestSpark.sf0001)
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id").as("a_user"),
        to_date(col("ts")).as("w_start"),
        date_add(to_date(col("ts")), 3).as("w_end"),
        col("event_id").as("anchor_id")
      )
    val bucketed = RangeJoin
      .dateIntervalJoin(ev, win, "user_id", "a_user", "event_date", "w_start", "w_end")
      .select("event_id", "anchor_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sorted
    val naive = ev
      .join(
        win,
        ev("user_id") === win("a_user") &&
          ev("event_date") >= win("w_start") && ev("event_date") < win("w_end")
      )
      .select("event_id", "anchor_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sorted
    assert(bucketed.nonEmpty)
    assert(bucketed.toSeq == naive.toSeq)
  }

  test("empty and inverted intervals match nothing") {
    import spark.implicits._
    val left = Seq((1L, java.sql.Date.valueOf("2024-01-05"))).toDF("k", "d")
    val right = Seq(
      (1L, java.sql.Date.valueOf("2024-01-05"), java.sql.Date.valueOf("2024-01-05")), // empty
      (1L, java.sql.Date.valueOf("2024-01-06"), java.sql.Date.valueOf("2024-01-01")) // inverted
    ).toDF("k", "s", "e")
    val out = RangeJoin.dateIntervalJoin(left, right, "k", "k", "d", "s", "e")
    assert(out.count() == 0)
  }
}
