package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.BloomKernels

/** Pins the properties d25's gate leans on — and the efficiency side the
  * gate deliberately leaves out (false-positive RATE is probabilistic by
  * design, so it is measured here, not oracle-pinned). */
class BloomKernelsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def bloomOf(items: Seq[String], parts: Int = 8): Array[Byte] = {
    import spark.implicits._
    BloomKernels.serialize(
      items.toDF("h").repartition(parts).stat.bloomFilter("h", 100000L, 0.01))
  }

  test("no false negatives: every inserted key probes positive") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val seen = (0 until 3000).map(i => s"key-$i")
    val bytes = bloomOf(seen)
    val misses = seen.toDF("h")
      .filter(!BloomKernels.mightContain(bytes, col("h")))
      .count()
    assert(misses == 0L, s"$misses inserted keys probed negative")
  }

  test("false-positive rate on disjoint keys stays near the configured 1%") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val bytes = bloomOf((0 until 3000).map(i => s"key-$i"))
    val fresh = (0 until 20000).map(i => s"other-$i")
    val fp = fresh.toDF("h")
      .filter(BloomKernels.mightContain(bytes, col("h")))
      .count()
    // deterministic for this fixed key set; 5x headroom over the 1% target
    assert(fp <= 20000 * 0.05, s"fp rate ${fp / 20000.0} far above configured 0.01")
  }

  test("probe is independent of the build's partitioning") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val seen = (0 until 2000).map(i => s"key-$i")
    val probes = ((0 until 2000 by 7).map(i => s"key-$i") ++
      (0 until 500).map(i => s"other-$i")).toDF("h")
    def answers(parts: Int): Seq[Boolean] = {
      val bytes = bloomOf(seen, parts)
      probes.orderBy("h")
        .select(BloomKernels.mightContain(bytes, col("h")))
        .collect().map(_.getBoolean(0)).toSeq
    }
    assert(answers(2) == answers(32), "probe answers depend on build partitioning")
  }

  test("compiles under whole-stage codegen (fallback disabled) and passes nulls through") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val bytes = bloomOf(Seq("a", "b"))
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = Seq(Some("a"), None, Some("zz")).toDF("h")
        .select(BloomKernels.mightContain(bytes, col("h")).as("p"))
        .collect()
      assert(out(0).getBoolean(0))
      assert(out(1).isNullAt(0), "null input must probe to null, not false")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None    => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
    Hygiene.release(spark)
  }
}
