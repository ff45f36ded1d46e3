package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bounded posting-list build (t38): non-overflowed lists are
  * COMPLETE (postings length == df, sorted), the df band filter is exact
  * even though the set aggregate caps its state (an overflowed key
  * provably has df > cap, so exclusion needs no full list), and both
  * populations — capped-out head phrases and kept mid-band phrases —
  * exist at the test tier, so the cap is exercised, not dead code. */
class PostingsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** (bigram, doc_id) pairs, replicated independently of LlmOps (same
    * tokenize/bigram rule, plain column ops). */
  // sf0.1, not the small tiers: the cap-exercised assertion below needs
  // head bigrams with df > 64 — max true df is 46 at sf0.01, 338 at sf0.1
  // (900 capped-out phrases, 31 kept)
  private val tier = "/root/testdata/sf0.1"
  private def pairs = {
    val t = array_remove(split(lower(col("text")), " "), "")
    Tables.documents(spark, tier)
      .select(col("doc_id"), t.as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(
        transform(sequence(lit(1), size(col("t")) - 1),
          i => concat_ws(" ", element_at(col("t"), i), element_at(col("t"), i + 1))))
        .as("bigram"))
  }

  test("t38: emitted lists are complete and sorted; the df band is exact under capping") {
    val rows = graft.queries.Registry.queries("t38_postings")(spark, tier)
      .collect()
    assert(rows.nonEmpty)
    // independent df per bigram (distinct docs)
    val trueDf = pairs.groupBy("bigram").agg(countDistinct("doc_id").as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- rows) {
      val (bg, df, postings) = (r.getString(0), r.getLong(1), r.getString(3))
      val ids = postings.split(",").map(_.toLong)
      assert(df >= 2 && df <= 64, s"$bg: df $df outside the band")
      assert(ids.length.toLong == df, s"$bg: postings length ${ids.length} != df $df")
      assert(ids.sameElements(ids.sorted), s"$bg: postings not sorted")
      assert(trueDf(bg) == df, s"$bg: emitted df $df != true df ${trueDf(bg)}")
    }
    // both populations exist: head phrases beyond the cap were excluded
    val capped = trueDf.count(_._2 > 64)
    assert(capped > 0, "no bigram exceeds the cap at this tier — the bound is unexercised")
    assert(rows.forall(r => trueDf(r.getString(0)) <= 64),
      "an over-cap bigram leaked through the df filter")
    Hygiene.release(spark)
  }

  test("bounded set state caps under synthetic skew and exclusion stays exact") {
    import spark.implicits._
    // one hot key touching 300 distinct docs, one cold key touching 5
    val df = ((1 to 300).map(i => ("hot", i.toLong)) ++ (1 to 5).map(i => ("cold", i.toLong)))
      .toDF("term", "doc_id")
    val agg = df.groupBy("term")
      .agg(
        countDistinct("doc_id").as("df"),
        graft.functions.BoundedCollectSet.boundedSet(col("doc_id"), 64).as("docs"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    val (hotDf, hotDocs) = agg("hot")
    val (coldDf, coldDocs) = agg("cold")
    assert(hotDf == 300L && hotDocs.length <= 65, "hot key state not bounded by the cap")
    assert(coldDf == 5L && coldDocs.sorted == (1L to 5L), "cold key list incomplete")
    Hygiene.release(spark)
  }
}
