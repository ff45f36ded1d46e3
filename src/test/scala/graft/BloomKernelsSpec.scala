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

  test("a null or empty filter literal fails at ANALYSIS, not executor-side (r13)") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    // BloomFilter.readFrom would NPE at the first probe — opaque,
    // executor-side. Misuse must fail analysis with the expression's own
    // message instead.
    val df = Seq("a").toDF("h")
    // a TYPED binary null (lit(null) alone is NullType and already fails
    // the type guard; the cast exercises the new null-literal branch)
    val nullBinary = call_function("bloom_might_contain", col("h"), lit(null).cast("binary"))
    val emptyBinary = BloomKernels.mightContain(Array.empty[Byte], col("h"))
    for (bad <- Seq(nullBinary, emptyBinary)) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        df.select(bad).collect()
      }
      assert(e.getMessage.contains("bloom_might_contain"), e.getMessage)
    }
  }

  /** r13 poisoned path: d25's `no_false_negative` verdict must be able
    * to read FALSE — build the filter with a seen key OMITTED (the
    * corruption the gate guards against: an admission filter that lost
    * part of the seen set silently admits duplicates) and drive the REAL
    * d25 tail ([[graft.queries.LlmOps.bloomAdmissionVerdicts]]) over a
    * replay of that key. */
  test("d25 poisoned path: a seen key omitted from the build reads no_false_negative FALSE") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val seenKeys = (0 until 500).map(i => s"key-$i")
    val seen = seenKeys.toDF("h")
    // arrivals replay key-7 (a dup) and bring one genuinely new key
    val arrivals = Seq(
      (1L, "key-7", true),
      (2L, "brand-new", false)
    ).toDF("doc_id", "h", "is_replay")
    def verdicts(buildKeys: Seq[String]) = {
      val bloom = buildKeys.toDF("h").stat
        .bloomFilter("h", math.max(buildKeys.size.toLong, 1000L), 0.01)
      graft.queries.LlmOps.bloomAdmissionVerdicts(seen, arrivals, bloom)
        .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    }
    val healthy = verdicts(seenKeys)
    assert(healthy(1L) && healthy(2L), "a complete build must pass every row")
    val poisoned = verdicts(seenKeys.filterNot(_ == "key-7"))
    assert(!poisoned(1L),
      "a replayed dup whose key was omitted from the build must read FALSE")
    assert(poisoned(2L), "the genuinely-new arrival is unaffected")
    Hygiene.release(spark)
  }
}
