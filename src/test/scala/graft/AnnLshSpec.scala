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

  test("multi-probe raises recall past the production bar without re-bucketing the corpus") {
    val emb = Tables.embeddings(spark, TestSpark.sf001).select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = graft.queries.LlmOps.e01
      .run(spark, TestSpark.sf001)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getAs[Long]("vid")).toSet).toMap
    def meanRecall(nprobe: Int): Double = {
      val approx = AnnLsh
        .topK(spark, emb, queries, dim = 64, k = 5, nprobe = nprobe)
        .collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getAs[Long]("vid")).toSet).toMap
      exact.map { case (qid, truth) =>
        approx.get(qid).map(a => (a & truth).size.toDouble / truth.size).getOrElse(0.0)
      }.sum / exact.size
    }
    val single = meanRecall(1)
    val multi = meanRecall(4)
    info(f"mean recall@5: nprobe=1 -> $single%.2f, nprobe=4 -> $multi%.2f")
    assert(multi >= single, "multi-probe can only add candidates")
    assert(multi >= 0.7, f"multi-probe recall below the e05 gate: $multi%.2f")
  }

  test("nprobe=1 probe sequence is exactly the single-bucket assignment") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001).select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 20)
    val a = AnnLsh.topK(spark, emb, queries, dim = 64, k = 5, nprobe = 1).collect()
    val b = AnnLsh.topK(spark, emb, queries, dim = 64, k = 5).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
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
