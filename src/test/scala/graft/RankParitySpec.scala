package graft

import org.scalatest.funsuite.AnyFunSuite

/** t21's distributed global rank must be invariant to the range-exchange
  * width: rank = per-partition offset + local row_number holds for ANY
  * monotonic partition assignment, so the tercile output is identical
  * whether the exchange is 2-wide (a laptop) or 2560-wide (a cluster).
  * The width comes from `defaultParallelism` in the registered query —
  * never hard-coded — and this spec pins that a width change is purely a
  * physical choice (the r6 shape fixed 32, which at 500M docs would push
  * the whole corpus through 32 tasks).
  */
class RankParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("t21 terciles are identical at 2-wide and 32-wide range exchanges") {
    val narrow = queries.LlmOps.nllBuckets(spark, TestSpark.sf0001, 2).collect()
    val wide = queries.LlmOps.nllBuckets(spark, TestSpark.sf0001, 32).collect()
    assert(narrow.length == 3, s"expected 3 buckets, got ${narrow.length}")
    assert(narrow.map(_.toString).toSeq == wide.map(_.toString).toSeq,
      s"rank output depends on exchange width:\n narrow=${narrow.mkString("; ")}\n wide=${wide.mkString("; ")}")
    Hygiene.release(spark)
  }

  test("registered t21 derives its width from the session's parallelism") {
    // local[4] test session: defaultParallelism = 4, not the bench's 32 —
    // the query must still produce the same three buckets
    val reg = SparkEntry.queries("t21_nll_buckets")(spark, TestSpark.sf0001).collect()
    val explicit = queries.LlmOps.nllBuckets(spark, TestSpark.sf0001, 7).collect()
    assert(reg.map(_.toString).toSeq == explicit.map(_.toString).toSeq)
    Hygiene.release(spark)
  }
}
