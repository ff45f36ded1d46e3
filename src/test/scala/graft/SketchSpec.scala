package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins the properties t33's gate leans on: the Count-Min sketch's
  * counters are SUMS, so the aggregate must be bit-deterministic across
  * partitionings (merge order cannot matter), and estimates can never
  * undercount — on any stream, not just the corpus. */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val agg =
    "count_min_sketch(g, CAST(0.01 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)"

  test("sketch bytes are identical across partition counts (merge-order independence)") {
    import spark.implicits._
    val items = (0 until 5000).map(i => s"g${i % 37}")
    def bytesAt(parts: Int): Seq[Byte] =
      items.toDF("g").repartition(parts).agg(expr(agg))
        .collect()(0).getAs[Array[Byte]](0).toSeq
    assert(bytesAt(2) == bytesAt(32), "CMS bytes depend on partitioning")
  }

  test("estimates never undercount, and heavy hitters obey the eps*N bound on a skewed stream") {
    import spark.implicits._
    // zipf-ish: item k appears 1000/k times — heavy head, long tail
    val items = (1 to 200).flatMap(k => Seq.fill(1000 / k)(s"item$k"))
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sk = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(
        items.toDF("g").repartition(8).agg(expr(agg))
          .collect()(0).getAs[Array[Byte]](0)))
    val bound = math.ceil(sk.relativeError() * sk.totalCount()).toLong
    for ((g, n) <- exact) {
      val est = sk.estimateCount(g)
      assert(est >= n, s"$g undercounted: $est < $n")
    }
    // the probabilistic bound, checked on the 20 heaviest (t33's shape)
    for ((g, n) <- exact.toSeq.sortBy(-_._2).take(20)) {
      val est = sk.estimateCount(g)
      assert(est <= n + bound, s"$g over bound: $est > $n + $bound")
    }
    Hygiene.release(spark)
  }
}
