package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the q51/q52 kernels on crafted frames: the basket pair counts /
  * support / confidence / lift arithmetic against hand-computed values,
  * and gap-fill's dense-day materialization + last-observation carry. */
class BasketGapFillSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("basket lift: hand-computed support/confidence/lift; in-basket dupes collapse") {
    import spark.implicits._
    // baskets: 1={A,B,C} (A twice — must dedup), 2={A,B}, 3={B,C}
    val b = Seq((1L, "A"), (1L, "A"), (1L, "B"), (1L, "C"),
      (2L, "A"), (2L, "B"), (3L, "B"), (3L, "C")).toDF("basket", "item")
    val got = graft.queries.Relational.basketLift(b, topK = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // counts: A=2 B=3 C=2, N=3; pairs (A,B)=2 (A,C)=1 (B,C)=2
    assert(got.toSeq == Seq(
      ("A", "B", 2L, 2.0 / 3, 1.0, 2.0 * 3 / (2 * 3)),
      ("B", "C", 2L, 2.0 / 3, 2.0 / 3, 2.0 * 3 / (3 * 2)),
      ("A", "C", 1L, 1.0 / 3, 0.5, 1.0 * 3 / (2 * 2))
    ))
    Hygiene.release(spark)
  }

  test("gap fill: missing days materialize unobserved and carry the last reading forward") {
    import spark.implicits._
    val e = Seq(
      (1L, "2024-01-01 08:00:00", 5.0), (1L, "2024-01-01 09:00:00", 4.0), // same day: max
      (1L, "2024-01-04 08:00:00", 2.0),
      (2L, "2024-02-10 01:00:00", 7.0)
    ).toDF("user_id", "ts_s", "value")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"), col("value"))
    val got = graft.queries.Relational.gapFillLocf(e).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, "2024-01-01", true, 5.0),
      (1L, "2024-01-02", false, 5.0),
      (1L, "2024-01-03", false, 5.0),
      (1L, "2024-01-04", true, 2.0),
      (2L, "2024-02-10", true, 7.0)
    ))
    Hygiene.release(spark)
  }
}
