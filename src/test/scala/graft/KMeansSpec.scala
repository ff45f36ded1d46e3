package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.KMeans

class KMeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def emb = Tables.embeddings(spark, TestSpark.sf0001).select("vec_id", "embedding")

  test("fit is deterministic (integer arithmetic, md5 seeds)") {
    val a = KMeans.fit(spark, emb, k = 4, iters = 2)
    val b = KMeans.fit(spark, emb, k = 4, iters = 2)
    assert(a.centroids.map(_.toSeq) === b.centroids.map(_.toSeq))
  }

  test("Lloyd iterations do not increase total SSE") {
    // monotone non-increase is the textbook invariant; with truncated
    // integer means it can be violated by at most a rounding epsilon per
    // point-dim, so allow that slack and require substantial progress
    // from the seeds overall
    val sses = (0 to 3).map { it =>
      val m = KMeans.fit(spark, emb, k = 4, iters = it)
      KMeans.assign(spark, emb, m).agg(sum("dist")).collect().head.getLong(0)
    }
    val eps = 1e-4
    sses.sliding(2).foreach { case Seq(prev, next) =>
      assert(next <= (prev * (1 + eps)).toLong, s"SSE rose: $sses")
    }
    assert(sses.last < sses.head, s"no progress from seeds: $sses")
  }

  test("every point is assigned to its nearest centroid (exact argmin)") {
    val m = KMeans.fit(spark, emb, k = 4, iters = 1)
    val fp = KMeans.fixedPoint(emb, "embedding")
    val withAll = fp.select(
      col("vec_id") +: m.centroids.zipWithIndex.map { case (c, i) =>
        expr(s"int_sqdist(x, ${c.mkString("array(", "L, ", "L)")})").as(s"d$i")
      }: _*
    )
    val assigned = KMeans.assign(spark, emb, m)
    val joined = withAll.join(assigned, "vec_id").collect()
    joined.foreach { r =>
      val ds = (0 until 4).map(i => r.getAs[Long](s"d$i"))
      val c = r.getAs[Int]("cluster")
      assert(r.getAs[Long]("dist") === ds(c))
      assert(ds(c) === ds.min)
      // tie-break: the assigned cluster is the SMALLEST id achieving min
      assert(ds.indexOf(ds.min) === c)
    }
  }

  test("k larger than corpus: empty clusters keep their seed centroid") {
    val tiny = emb.limit(3)
    val m = KMeans.fit(spark, tiny, k = 5, iters = 2)
    // seeds clamp to corpus size when the corpus is smaller than k
    assert(m.k === 3 && m.centroids.length === 3)
    val sizes = KMeans.assign(spark, tiny, m).groupBy("cluster").count().collect()
    assert(sizes.map(_.getLong(1)).sum === 3)
  }
}
