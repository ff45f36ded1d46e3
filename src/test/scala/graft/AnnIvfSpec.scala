package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.AnnIvf

class AnnIvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("IVF top-k recalls most brute-force neighbors probing a corpus fraction") {
    val emb = Tables.embeddings(spark, TestSpark.sf001).select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 10)
    val approx = AnnIvf
      .topK(spark, emb, queries, k = 5, nlist = 16, nprobe = 4)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getAs[Long]("vid")).toSet).toMap

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
    assert(meanRecall >= 0.4, f"recall too low: $meanRecall%.2f")
  }

  test("centroids are deterministic and complete (every cluster has one)") {
    val emb = Tables.embeddings(spark, TestSpark.sf001).select("vec_id", "embedding")
    val c1 = AnnIvf.centroids(spark, emb, 8)
    val c2 = AnnIvf.centroids(spark, emb, 8)
    assert(c1.size == 8 && c2.size == 8)
    assert(c1.zip(c2).forall { case (a, b) => a.sameElements(b) })
    assert(c1.forall(_.length == 64))
  }
}
