package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Registry

/** Every registered query must plan and execute at the smoke tier.
  * (The DuckDB hash-compare runs in the driver's Verify gate; this spec
  * guards against regressions that break execution outright.)
  */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // Queries whose correct result CAN be empty at sf0.001.
  private val mayBeEmpty = Set("e02_embed_neardup", "d02_dedup_minhash_lsh",
    "d03_dedup_ngram_jaccard", "q19_inactive_customers", "d17_dedup_lsh_persisted")

  Registry.all.foreach { q =>
    test(s"${q.name} executes at sf0.001") {
      val n = q.run(spark, TestSpark.sf0001).count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("entry() flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("documents contract: doc_id is unique (Tables.documents invariant)") {
    // Per-row kernels (d04 simhash, t01-t05) and their GROUP BY doc_id
    // oracles are equivalent only under this invariant.
    val docs = Tables.documents(spark, TestSpark.sf0001)
    assert(docs.count() === docs.select("doc_id").distinct().count())
  }
}
