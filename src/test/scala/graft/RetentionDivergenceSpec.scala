package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the q49/q50/t41/t42 kernels on crafted frames with hand-computed
  * answers: the retention triangle's offset arithmetic, the rolling
  * window's trailing-day membership, JS divergence against a by-hand
  * computation (including the identical-distribution zero and the
  * no-shared-vocabulary absence), and BPE pair weighting + tie order. */
class RetentionDivergenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(day: String) = s"$day 12:00:00"

  test("cohort retention: offsets count weeks since the user's first event week") {
    import spark.implicits._
    // weeks (Mon-start): 2024-01-01, 2024-01-08, 2024-01-15
    // u1: first wk1, returns wk2 and wk3; u2: first wk1 only;
    // u3: first wk2, returns wk3; two rows in one week dedup to one visit
    val e = Seq(
      (1L, ts("2024-01-02")), (1L, ts("2024-01-03")), // wk1 twice -> one visit
      (1L, ts("2024-01-09")), (1L, ts("2024-01-17")),
      (2L, ts("2024-01-04")),
      (3L, ts("2024-01-10")), (3L, ts("2024-01-16"))
    ).toDF("user_id", "ts_s").select(col("user_id"), col("ts_s").cast("timestamp").as("ts"))
    val got = graft.queries.Relational.cohortRetention(e).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0, 2L, 1.0),  // u1, u2
      ("2024-01-01", 1, 1L, 0.5),  // u1
      ("2024-01-01", 2, 1L, 0.5),  // u1
      ("2024-01-08", 0, 1L, 1.0),  // u3
      ("2024-01-08", 1, 1L, 1.0)   // u3
    ))
    Hygiene.release(spark)
  }

  test("rolling active: WAU is the trailing 7-day distinct-user union; gap days emit no row") {
    import spark.implicits._
    // day 01: u1,u2   day 03: u2   day 09: u3  (08 within 7d of 03; 09 is not of 01)
    val e = Seq(
      (1L, ts("2024-01-01")), (2L, ts("2024-01-01")), (2L, ts("2024-01-03")),
      (3L, ts("2024-01-09"))
    ).toDF("user_id", "ts_s").select(col("user_id"), col("ts_s").cast("timestamp").as("ts"))
    val got = graft.queries.Relational.rollingActive(e).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 2L, 2L, 1.0),
      ("2024-01-03", 1L, 2L, 0.5),          // u2 that day; {u1,u2} in [12-28, 01-03]
      ("2024-01-09", 1L, 2L, 0.5)           // u3 that day; {u2 (01-03), u3} trailing
    ), got.toSeq.toString)
    // only observed days appear — no row for the gap days 02, 04..08
    assert(got.length == 3)
    Hygiene.release(spark)
  }

  test("source divergence: zero for identical distributions, hand value for a known split, absent for disjoint vocab") {
    import spark.implicits._
    val docs = Seq(
      ("a", "x x y"), ("b", "x x y"),       // identical distributions
      ("c", "x y"),                          // vs a: p(x)=2/3 vs 1/2
      ("d", "zq zq")                         // shares no token with anyone
    ).toDF("source", "text")
    val got = graft.queries.LlmOps.sourceDivergence(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(math.abs(got(("a", "b"))._2) < 1e-8, "identical distributions must read ~0")
    assert(got(("a", "b"))._1 == 2L)
    // JS({2/3,1/3},{1/2,1/2}) by hand
    def kl(p: Seq[Double], m: Seq[Double]) =
      p.zip(m).map { case (pi, mi) => if (pi == 0) 0.0 else pi * math.log(pi / mi) }.sum
    val p = Seq(2.0 / 3, 1.0 / 3); val q = Seq(0.5, 0.5)
    val m = p.zip(q).map { case (a, b) => (a + b) / 2 }
    val expect = 0.5 * kl(p, m) + 0.5 * kl(q, m)
    assert(math.abs(got(("a", "c"))._2 - expect) < 1e-8)
    assert(!got.contains(("a", "d")) && !got.contains(("c", "d")),
      "no-shared-vocabulary pairs emit no row")
    Hygiene.release(spark)
  }

  test("transition matrix: per-user lag pairs with tie-break; probabilities row-normalize") {
    import spark.implicits._
    // u1: a->b->a (ties on ts broken by event_id); u2: a->b
    val e = Seq(
      (1L, 1L, "2024-01-01 00:00:00", "a"), (1L, 2L, "2024-01-01 00:00:00", "b"),
      (1L, 3L, "2024-01-01 00:00:01", "a"),
      (2L, 4L, "2024-01-02 00:00:00", "a"), (2L, 5L, "2024-01-02 00:00:01", "b")
    ).toDF("user_id", "event_id", "ts_s", "event_type")
      .select(col("user_id"), col("event_id"), col("ts_s").cast("timestamp").as("ts"),
        col("event_type"))
    val got = graft.queries.Relational.transitionMatrix(e).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
    Hygiene.release(spark)
  }

  test("gram novelty: batch 0 reads 1.0; an all-repeat batch reads 0.0") {
    import spark.implicits._
    // 4 docs -> 2 batches of 2. Batch 1's docs repeat batch 0's text:
    // zero new grams in batch 1.
    val docs = Seq(
      (0L, "a b c d"), (1L, "e f g h"),
      (2L, "a b c d"), (3L, "e f g")
    ).toDF("doc_id", "text")
    val got = graft.queries.LlmOps.gramNovelty(docs, nBatches = 2).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // batch 0 grams: {abc,bcd,efg,fgh} all new; batch 1: {abc,bcd,efg} none new
    assert(got.toSeq == Seq((0, 4L, 4L, 1.0), (1, 3L, 0L, 0.0)))
    Hygiene.release(spark)
  }

  test("bpe pairs: counts weight by word frequency; ties break on the pair") {
    import spark.implicits._
    // "ab" appears in 'abc' (x3 docs of 'abc abc') = freq 6, and 'ab' freq 1
    val docs = Seq("abc abc", "abc abc", "abc abc", "ab", "z").toDF("text")
    val got = graft.queries.LlmOps.bpeMergePairs(docs, 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // pairs: 'ab' from abc(6) + ab(1) = 7; 'bc' from abc = 6; 'z' too short
    assert(got.toSeq == Seq(("ab", 7L), ("bc", 6L)))
    // tie order: two pairs with equal counts sort lexicographically
    val tied = graft.queries.LlmOps.bpeMergePairs(Seq("ba ab").toDF("text"), 10)
      .collect().map(_.getString(0)).toSeq
    assert(tied == Seq("ab", "ba"))
    Hygiene.release(spark)
  }
}
