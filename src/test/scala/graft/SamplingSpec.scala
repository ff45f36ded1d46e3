package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Sampling

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] = {
    import spark.implicits._
    df.select("id").as[Long].collect().toSet
  }

  private lazy val corpus = {
    import spark.implicits._
    (0L until 2000L).map(i => (i, s"doc body $i", if (i % 4 == 0) "en" else "xx"))
      .toDF("id", "text", "stratum")
  }

  test("thresholdHex renders the fraction as 9 lowercase hex digits") {
    assert(Sampling.thresholdHex(0.0) == "000000000")
    // 9 digits so fraction=1.0 exceeds every "0"-prefixed 8-digit bucket:
    // an 8-digit cap at "ffffffff" would drop buckets equal to it
    assert(Sampling.thresholdHex(1.0) == "100000000")
    assert(Sampling.thresholdHex(0.5) == "080000000")
    assert(Sampling.thresholdHex(0.2) == "033333333")
  }

  test("fraction 1.0 keeps the complete dataset, including max-bucket keys") {
    assert(ids(Sampling.hashSample(corpus, col("text"), 1.0)).size == 2000)
    // and the threshold string itself is strictly above any possible bucket
    assert("0ffffffff" < Sampling.thresholdHex(1.0))
  }

  test("hashSample is deterministic, order-independent, and near the fraction") {
    val a = ids(Sampling.hashSample(corpus, col("text"), 0.3))
    val b = ids(Sampling.hashSample(corpus.repartition(13), col("text"), 0.3))
    assert(a == b, "membership must not depend on partitioning")
    assert(math.abs(a.size - 600) < 120, s"got ${a.size}, expected ~600")
  }

  test("different salts draw independent samples") {
    val a = ids(Sampling.hashSample(corpus, col("text"), 0.3, salt = "s1"))
    val b = ids(Sampling.hashSample(corpus, col("text"), 0.3, salt = "s2"))
    assert(a != b)
    // overlap should be ~ fraction^2 of the corpus, not ~ fraction
    assert((a intersect b).size < 400)
  }

  test("nested fractions: a smaller sample is a subset of a larger one") {
    // same salt => the 10% sample is exactly the low-hash prefix of the 30%
    val small = ids(Sampling.hashSample(corpus, col("text"), 0.1))
    val big = ids(Sampling.hashSample(corpus, col("text"), 0.3))
    assert(small.subsetOf(big))
  }

  test("stratified: per-stratum rates apply and strata do not interfere") {
    val sampled = Sampling.hashSampleStratified(
      corpus, col("text"), col("stratum"),
      fractions = Map("en" -> 1.0), defaultFraction = 0.25)
    val en = ids(sampled.filter(col("stratum") === "en"))
    assert(en.size == 500, "fraction 1.0 keeps every en row")
    val xx = ids(sampled.filter(col("stratum") === "xx"))
    assert(math.abs(xx.size - 375) < 100, s"got ${xx.size}, expected ~375")
    // changing en's rate must not change which xx rows are kept
    val resampled = Sampling.hashSampleStratified(
      corpus, col("text"), col("stratum"),
      fractions = Map("en" -> 0.0), defaultFraction = 0.25)
    assert(ids(resampled.filter(col("stratum") === "xx")) == xx)
    assert(ids(resampled.filter(col("stratum") === "en")).isEmpty)
  }
}
