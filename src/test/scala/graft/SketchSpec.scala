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

  // ---- poisoned-path tests (r13): each verdict column must be able to
  // read FALSE on the exact corruption it guards against — otherwise the
  // oracle's pinned TRUE proves nothing (the RecallGateSpec discipline
  // applied to the sketch gates).

  private def cmsOf(items: Seq[String], parts: Int = 4) = {
    import spark.implicits._
    val bytes = items.toDF("g").repartition(parts).agg(expr(agg))
      .collect()(0).getAs[Array[Byte]](0)
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
  }

  test("t33 poisoned path: a sketch missing part of the stream reads no_undercount FALSE") {
    val full = (1 to 50).flatMap(k => Seq.fill(20)(s"item$k"))
    // the broken path: a dropped merge — the sketch saw only half the stream
    val sk = cmsOf(full.take(full.size / 2))
    val bound = math.ceil(sk.relativeError() * sk.totalCount()).toLong
    val exactTop = full.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(-_._2).take(20)
    val verdicts = graft.queries.LlmOps.cmsVerdictRows(sk, exactTop, bound)
    assert(verdicts.exists(v => !v._3),
      "a half-stream sketch must under-count at least one heavy hitter")
    Hygiene.release(spark)
  }

  test("t33 poisoned path: an estimate-inflating merge bug reads bound_ok FALSE") {
    val full = (1 to 50).flatMap(k => Seq.fill(20)(s"item$k"))
    // the broken path: the sketch merged with itself — every counter
    // doubles (a double-applied partition), estimates 2x the truth
    val sk = cmsOf(full)
    sk.mergeInPlace(cmsOf(full))
    // the bound the gate WOULD claim for the honest stream (the doubled
    // totalCount would also double the claimed bound and hide the bug)
    val honest = cmsOf(full)
    val bound = math.ceil(honest.relativeError() * honest.totalCount()).toLong
    val exactTop = full.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(-_._2).take(20)
    val verdicts = graft.queries.LlmOps.cmsVerdictRows(sk, exactTop, bound)
    assert(verdicts.forall(_._3), "doubling never under-counts")
    assert(verdicts.exists(v => !v._4),
      "a doubled sketch must blow the eps*N bound on at least one heavy hitter")
    Hygiene.release(spark)
  }

  test("t34 poisoned path: a blob dropped from the union reads merged_est_ok FALSE") {
    import spark.implicits._
    // 4 shards x 250 unique grams each: dropping one shard loses 25% of
    // the distinct mass — far past the 5% bound
    val grams = (0 until 1000).map(i => ("web", i % 4, s"gram$i")).toDF("source", "shard", "bigram")
    val direct = grams
      .groupBy("source")
      .agg(
        countDistinct(col("bigram")).as("n_exact"),
        expr("hll_sketch_estimate(hll_sketch_agg(bigram, 12))").as("est"))
    val blobs = grams
      .groupBy("source", "shard")
      .agg(expr("hll_sketch_agg(bigram, 12)").as("sk"))
    def mergedOf(b: org.apache.spark.sql.DataFrame) = b
      .groupBy("source")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est_merged"))
    val healthy = graft.queries.LlmOps
      .distinctSketchVerdicts(direct, mergedOf(blobs)).collect()
    assert(healthy.forall(r => r.getBoolean(2) && r.getBoolean(3)),
      "healthy union must pass both bounds")
    val poisoned = graft.queries.LlmOps
      .distinctSketchVerdicts(direct, mergedOf(blobs.filter(col("shard") =!= 0)))
      .collect()
    assert(poisoned.forall(r => r.getBoolean(2)), "est_ok is the single-pass side — unaffected")
    assert(poisoned.exists(r => !r.getBoolean(3)),
      "a union missing 25% of the distinct mass must read merged_est_ok FALSE")
    Hygiene.release(spark)
  }

  test("t35 poisoned paths: a dropped blob and a double merge each read their verdict FALSE") {
    // the sharded heavy-hitter path answers from per-shard blobs; the
    // merge-exactness verdict must catch exactly the two blob-ledger
    // corruptions possible at that layer
    val shards = (0 until 4).map(sh =>
      (1 to 50).flatMap(k => Seq.fill(10)(s"shard$sh-item$k")))
    val full = shards.flatten
    val single = cmsOf(full)
    def mergeAll(parts: Seq[Seq[String]]) =
      parts.map(p => cmsOf(p)).reduce { (a, b) => a.mergeInPlace(b); a }
    val bound = math.ceil(single.relativeError() * single.totalCount()).toLong
    val exactTop = full.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(t => (-t._2, t._1)).take(20)
    val healthy = graft.queries.LlmOps
      .cmsVerdictRows(mergeAll(shards), exactTop, bound)
    assert(healthy.forall(v => v._3 && v._4), "healthy merge must hold both bounds")
    val healthyExact = graft.queries.LlmOps
      .cmsMergedVerdictRows(mergeAll(shards), single, exactTop, bound)
    assert(healthyExact.forall(_._5),
      "CMS merge is counter addition — merged must EQUAL single-pass")
    // dropped blob: estimates for that shard's grams fall under exact
    val dropped = graft.queries.LlmOps
      .cmsMergedVerdictRows(mergeAll(shards.tail), single, exactTop, bound)
    assert(dropped.exists(v => !v._3), "a dropped blob must under-count")
    assert(dropped.exists(v => !v._5), "a dropped blob must break merge-exactness")
    // double merge: one shard applied twice over-counts past the bound
    val doubled = graft.queries.LlmOps
      .cmsMergedVerdictRows(mergeAll(shards :+ shards.head), single, exactTop, bound)
    assert(doubled.forall(_._3), "doubling never under-counts")
    assert(doubled.exists(v => !v._5), "a double merge must break merge-exactness")
    Hygiene.release(spark)
  }

  test("q43 poisoned path: a quantile value outside the GK window reads rank_ok FALSE") {
    import spark.implicits._
    val li = (1 to 1000).map(i => ("A", i.toDouble)).toDF("l_returnflag", "l_extendedprice")
    // healthy claim: the true median; poisoned claim: the minimum passed
    // off as the p=0.5 quantile (a broken summary merge's failure shape)
    val healthy = Seq(("A", 0.5, 500.0)).toDF("l_returnflag", "p", "v")
    val poisoned = Seq(("A", 0.5, 1.0)).toDF("l_returnflag", "p", "v")
    val ok = graft.queries.Relational.rankBoundVerdicts(li, healthy, 100).collect()
    assert(ok.forall(_.getBoolean(3)), "the true median must pass its own window")
    val bad = graft.queries.Relational.rankBoundVerdicts(li, poisoned, 100).collect()
    assert(bad.forall(r => !r.getBoolean(3)),
      "rank 1 claimed as the median must read rank_ok FALSE")
    Hygiene.release(spark)
  }
}
