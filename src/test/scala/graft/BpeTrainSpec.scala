package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.LlmOps

/** Pins the t46 BPE trainer on the canonical Sennrich-style corpus whose
  * 8-round merge sequence is computed by hand below — argmax selection,
  * lexicographic tie-breaks, transitive merges (later rounds pairing
  * tokens built by earlier rounds), count-at-merge-time reporting, and
  * the early-exhaustion and non-alphabetic-filter edges. */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("known corpus: the full 8-round merge sequence matches the hand computation") {
    import spark.implicits._
    // word frequencies: low 5, lower 2, newest 6, widest 3.
    // round 1: (e,s)=9 ties (s,t)=9, e < s        -> es, 9
    // round 2: (es,t)=9                            -> est, 9
    // round 3: (l,o)=7 ties (o,w)=7, l < o         -> lo, 7
    // round 4: (lo,w)=7                             -> low, 7
    // round 5: (e,w)=6 ties (n,e),(w,est), e first  -> ew, 6
    // round 6: (ew,est)=6 ties (n,ew), ew < n       -> ewest, 6
    // round 7: (n,ewest)=6                          -> newest, 6
    // round 8: (d,est)=3 ties (i,d),(w,i), d first  -> dest, 3
    val docs = Seq(
      "low low low low low",
      "lower lower",
      "newest newest newest newest newest newest",
      "widest widest widest"
    ).toDF("text")
    val got = LlmOps.bpeTrain(docs, rounds = 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    val want = Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L),
      (4, "lo", "w", "low", 7L),
      (5, "e", "w", "ew", 6L),
      (6, "ew", "est", "ewest", 6L),
      (7, "n", "ewest", "newest", 6L),
      (8, "d", "est", "dest", 3L))
    assert(got == want)
    Hygiene.release(spark)
  }

  test("t47: applying the trained merges tokenizes the corpus as hand-computed") {
    import spark.implicits._
    // same corpus as above; after the 8 merges the dictionary reads
    //   low(5+2 via lower's prefix) -> [low] / lower -> [low, e, r]
    //   newest -> [newest] / widest -> [w, i, dest]
    val docs = Seq(
      "low low low low low",
      "lower lower",
      "newest newest newest newest newest newest",
      "widest widest widest"
    ).toDF("text")
    val got = LlmOps.bpeTokenStats(docs, rounds = 8, topK = 20).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = Seq(
      ("low", 7L), ("newest", 6L), ("dest", 3L), ("i", 3L), ("w", 3L),
      ("e", 2L), ("r", 2L))
    assert(got == want)
    Hygiene.release(spark)
  }

  test("greedy left-to-right merge: an odd run of the same char pairs non-overlapping") {
    import spark.implicits._
    // "lll" = [l,l,l]: merging (l,l) greedily gives [ll, l], never [l, ll];
    // round 2 must then see the (ll, l) pair, not (l, ll)
    val docs = Seq("lll lll lll").toDF("text")
    val got = LlmOps.bpeTrain(docs, rounds = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(got == Seq((1, "l", "l", 6L), (2, "ll", "l", 3L)))
    Hygiene.release(spark)
  }

  test("exhaustion stops early; non-alphabetic words never enter the dictionary") {
    import spark.implicits._
    // only single-char alphabetic words (no pairs anywhere) plus tokens
    // the ^[a-z]+$ gate must drop — including multi-char ones that WOULD
    // have produced pairs had they leaked through
    val docs = Seq("a b c low3 low! 42").toDF("text")
    assert(LlmOps.bpeTrain(docs, rounds = 5).count() == 0L)
    // one mergeable word: rounds stop when the dictionary is fully merged
    val one = Seq("ab ab ab").toDF("text")
    val got = LlmOps.bpeTrain(one, rounds = 5).collect()
      .map(r => (r.getInt(0), r.getString(3), r.getLong(4))).toSeq
    assert(got == Seq((1, "ab", 3L)),
      "after (a,b) merges the word is one token — no further rounds may emit")
    Hygiene.release(spark)
  }
}
