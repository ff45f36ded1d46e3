package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the q46/q47/t39 kernels on crafted frames where the answer is
  * known by hand — in particular the funnel's ORDERED semantics (the case
  * the min-per-type approximation gets wrong) and the skew audit's
  * factors on a constructed hot key. */
class FunnelAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("funnel counts only in-order progressions") {
    import spark.implicits._
    // u1: view(10) click(20) purchase(30)   — completes
    // u2: click(5) view(10)                 — click BEFORE the first view
    //                                          only: must NOT reach stage 2
    // u3: view(10) click(20) purchase(15)   — purchase before click: stops at 2
    // u4: click(1) view(2) click(3)         — early click, but a later one
    //                                          after the view: reaches stage 2
    val e = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "click", 5L), (2L, "view", 10L),
      (3L, "view", 10L), (3L, "click", 20L), (3L, "purchase", 15L),
      (4L, "click", 1L), (4L, "view", 2L), (4L, "click", 3L)
    ).toDF("user_id", "event_type", "ts_s")
    val got = graft.queries.Relational.funnel(e, Seq("view", "click", "purchase"))
      .orderBy("stage").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got(0) == (("1_view", 4L, 1.0)))
    assert(got(1)._1 == "2_click" && got(1)._2 == 3L) // u1, u3, u4 — not u2
    assert(math.abs(got(1)._3 - 0.75) < 1e-12)
    assert(got(2)._1 == "3_purchase" && got(2)._2 == 1L) // only u1
    assert(math.abs(got(2)._3 - 1.0 / 3) < 1e-12)
    Hygiene.release(spark)
  }

  test("a user with zero first-stage events never enters the funnel") {
    import spark.implicits._
    val e = Seq((9L, "click", 1L), (9L, "purchase", 2L))
      .toDF("user_id", "event_type", "ts_s")
    val got = graft.queries.Relational.funnel(e, Seq("view", "click"))
      .orderBy("stage").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(0L, 0L))
    assert(got(1).getDouble(2) == 0.0, "conv out of an empty stage must be 0, not NaN")
    Hygiene.release(spark)
  }

  test("skew audit names the hot key with the right factor") {
    import spark.implicits._
    // 9 keys with 10 rows each + one hot key with 910: mean = 100,
    // hot skew = 9.1, cold skew = 0.1
    val df = ((1 to 910).map(_ => 0L) ++ (1L to 9L).flatMap(k => Seq.fill(10)(k)))
      .toDF("k")
    val got = graft.queries.Relational.skewAudit(df, "k", 3)
      .orderBy(col("n").desc, col("key")).collect()
    assert(got.length == 3)
    val hot = got.head
    assert(hot.getLong(0) == 0L && hot.getLong(1) == 910L)
    assert(hot.getLong(2) == 10L && hot.getLong(3) == 910L)
    assert(math.abs(hot.getDouble(4) - 100.0) < 1e-12)
    assert(math.abs(hot.getDouble(5) - 9.1) < 1e-12)
    assert(math.abs(got(1).getDouble(5) - 0.1) < 1e-12)
    Hygiene.release(spark)
  }

  test("vocab coverage curve is exact on a known distribution") {
    import spark.implicits._
    // counts: a=5, b=3, c=2 over 10 occurrences
    val occ = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")).toDF("term")
    val got = graft.queries.LlmOps.vocabCoverage(occ, 2)
      .orderBy("rank").collect()
    assert(got.length == 2)
    assert(got(0).getString(1) == "a" && got(0).getLong(2) == 5L &&
      math.abs(got(0).getDouble(5) - 0.5) < 1e-12)
    assert(got(1).getString(1) == "b" && got(1).getLong(3) == 8L &&
      math.abs(got(1).getDouble(5) - 0.8) < 1e-12)
    // shares are of ALL occurrences, not just the cut — the OOV mass at
    // the cut is 1 - cum_share
    assert(math.abs((1.0 - got(1).getDouble(5)) - 0.2) < 1e-12)
    Hygiene.release(spark)
  }
}
