package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.AnnLsh

class AnnLshSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("LSH top-k recalls most brute-force neighbors at a fraction of the comparisons") {
    val emb = Tables.embeddings(spark, TestSpark.sf001).select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 10)
    val approx = AnnLsh
      .topK(spark, emb, queries, dim = 64, k = 5)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getAs[Long]("vid")).toSet).toMap

    // brute-force ground truth from the oracle-verified query
    val exact = graft.queries.LlmOps.e01
      .run(spark, TestSpark.sf001)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getAs[Long]("vid")).toSet).toMap

    val recalls = exact.map { case (qid, truth) =>
      approx.get(qid).map(a => (a & truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    val meanRecall = recalls.sum / recalls.size
    info(f"mean recall@5 = $meanRecall%.2f over ${exact.size} queries")
    // near-random vectors are LSH's worst case; still beat chance by far
    assert(meanRecall >= 0.4, f"recall too low: $meanRecall%.2f")
  }

  test("bucket assignment is deterministic and bounded") {
    val emb = Tables.embeddings(spark, TestSpark.sf001).select("vec_id", "embedding")
    val b1 = AnnLsh.buckets(spark, emb, 64).select("vec_id", "t", "bucket").collect()
    val b2 = AnnLsh.buckets(spark, emb, 64).select("vec_id", "t", "bucket").collect()
    assert(b1.map(_.toSeq).toSet == b2.map(_.toSeq).toSet)
    assert(b1.forall { r =>
      val bk = r.getInt(2); bk >= 0 && bk < 16
    })
  }
}
