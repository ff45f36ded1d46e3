package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the retrieval-quality metrics (t36) against a from-scratch Scala
  * recompute: collect the shared per-(term, doc) score frame, rank it with
  * plain sorting (score desc, doc_id — the query's exact tie rule), and
  * re-derive every metric with java.math.BigDecimal from the same baked
  * discount literals. Proves the distributed top-10 (groupedRank) IS the
  * true top-10 and each metric formula is the textbook one — independent
  * of the DuckDB oracle, which re-derives the same numbers a third way. */
class RetrievalMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("t36 metrics match a from-scratch recompute of the shared score frame") {
    import java.math.BigDecimal
    val got = graft.queries.Registry.queries("t36_retrieval_metrics")(spark, TestSpark.sf0001)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.nonEmpty)

    val scored = graft.queries.LlmOps.termScored(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDecimal(3)))
      .groupBy(_._1)
    assert(scored.keySet == got.keySet, "metric rows don't cover the score frame's terms")

    val disc = graft.queries.LlmOps.dcgDiscount.map(new BigDecimal(_))
    val idcg = graft.queries.LlmOps.idcgAt.map(new BigDecimal(_))

    for ((term, rows) <- scored) {
      val ranked = rows.sortBy { case (_, docId, _, sc) => (sc.negate, docId) }(
        Ordering.Tuple2(Ordering.ordered[BigDecimal], Ordering.Long))
      val top10 = ranked.take(10)
      val rel10 = top10.map(_._3 >= 3L)
      val nRel = rows.count(_._3 >= 3L)
      val hits = rel10.count(identity)
      val mrr = rel10.zipWithIndex.collectFirst { case (true, i) => 1.0 / (i + 1) }.getOrElse(0.0)
      val dcg = rel10.zipWithIndex.collect { case (true, i) => disc(i) }
        .foldLeft(BigDecimal.ZERO)(_.add(_))
      val idcg10 = if (nRel == 0) BigDecimal.ZERO else idcg(math.min(10, nRel) - 1)
      val ndcg = if (nRel == 0) 0.0 else dcg.doubleValue() / idcg10.doubleValue()

      val g = got(term)
      assert(g.getLong(1) == nRel.toLong, s"$term n_rel")
      assert(g.getLong(2) == hits.toLong, s"$term hits10")
      assert(math.abs(g.getDouble(3) - hits / 10.0) < 1e-12, s"$term precision10")
      val recall = if (nRel == 0) 0.0 else hits.toDouble / nRel
      assert(math.abs(g.getDouble(4) - recall) < 1e-12, s"$term recall10")
      assert(math.abs(g.getDouble(5) - mrr) < 1e-12, s"$term mrr10")
      assert(math.abs(g.getDouble(6) - dcg.doubleValue()) < 1e-12, s"$term dcg10")
      assert(math.abs(g.getDouble(7) - idcg10.doubleValue()) < 1e-12, s"$term idcg10")
      assert(math.abs(g.getDouble(8) - ndcg) < 1e-12, s"$term ndcg10")
      // metric sanity that must hold for ANY run
      assert(g.getDouble(8) >= 0.0 && g.getDouble(8) <= 1.0 + 1e-12, s"$term ndcg range")
      assert(g.getDouble(6) <= g.getDouble(7) + 1e-12, s"$term dcg > ideal dcg")
    }
    Hygiene.release(spark)
  }

  test("the baked discount literals are 1/log2(rank+1) and their prefix sums") {
    val disc = graft.queries.LlmOps.dcgDiscount.map(_.toDouble)
    for (i <- disc.indices)
      assert(math.abs(disc(i) - 1.0 / (math.log(i + 2) / math.log(2))) < 1e-14,
        s"discount at rank ${i + 1}")
    val idcg = graft.queries.LlmOps.idcgAt.map(_.toDouble)
    val prefix = disc.scanLeft(0.0)(_ + _).tail
    for (i <- idcg.indices)
      assert(math.abs(idcg(i) - prefix(i)) < 1e-12, s"ideal dcg prefix at ${i + 1}")
  }
}
