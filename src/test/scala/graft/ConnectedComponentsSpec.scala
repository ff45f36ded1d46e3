package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def comps(edges: Seq[(Long, Long)], maxIter: Int = 25): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents
      .components(edges.toDF("a", "b"), "a", "b", maxIter)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
  }

  test("chain, clique, and separate components resolve to min ids") {
    val labels = comps(
      Seq(
        // chain 1-2-3-4 (diameter 3: exercises multi-hop propagation)
        (1L, 2L), (2L, 3L), (3L, 4L),
        // triangle 10-11-12 with duplicate + reversed edges
        (10L, 11L), (11L, 12L), (12L, 10L), (11L, 10L), (10L, 11L),
        // pair + self-loop
        (20L, 21L), (22L, 22L)
      )
    )
    assert(labels == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 22L
    ))
  }

  test("min id propagates across a long path (many iterations)") {
    // path 0-1-2-...-12: min label must travel 12 hops
    val labels = comps((0L until 12L).map(i => (i, i + 1)))
    assert(labels.values.toSet == Set(0L))
    assert(labels.size == 13)
  }

  test("throws instead of returning wrong labels when maxIter is too small") {
    val e = intercept[IllegalStateException] {
      comps((0L until 12L).map(i => (i, i + 1)), maxIter = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("edge direction does not matter") {
    assert(comps(Seq((5L, 1L), (1L, 9L))) == Map(1L -> 1L, 5L -> 1L, 9L -> 1L))
  }
}
