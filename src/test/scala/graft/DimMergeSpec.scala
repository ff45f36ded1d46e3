package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the MERGE/SCD2 semantics of q45 beyond the cross-engine hash: the
  * oracle proves both engines compute the same rows; this spec proves the
  * rows mean what a dimension-maintenance user needs them to mean —
  * every key lands in exactly one action class, the action classes ARE the
  * dim/batch set algebra, history is contiguous (close.valid_to ==
  * update.valid_from), and the merged balance is the exact decimal sum of
  * the closed version and the batch spend. */
class DimMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q45: one action class per key, set-algebra attribution, contiguous exact history") {
    val q = graft.queries.Registry.queries("q45_dim_merge_scd2")
    val rows = q(spark, TestSpark.sf0001).collect()

    // independent key sets straight from the base tables
    val dimKeys = Tables.customer(spark, TestSpark.sf0001)
      .filter(col("c_custkey") % 4 =!= 0)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val batch = Tables.orders(spark, TestSpark.sf0001)
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap

    // all three actions must be populated at this tier (the merge is only
    // exercised when matched, dim-only, and batch-only keys all exist)
    val byKey = rows.groupBy(_.getLong(0))
    val actionSets = byKey.map { case (k, vs) => k -> vs.map(_.getString(2)).toSet }
    assert(actionSets.values.toSet == Set(Set("close", "update"), Set("unchanged"), Set("insert")),
      s"unexpected action classes: ${actionSets.values.toSet}")

    def keysOf(a: String) = actionSets.collect { case (k, s) if s.contains(a) => k }.toSet
    assert(keysOf("close") == (dimKeys intersect batch.keySet), "matched keys wrong")
    assert(keysOf("update") == (dimKeys intersect batch.keySet), "update keys wrong")
    assert(keysOf("unchanged") == (dimKeys diff batch.keySet), "dim-only keys wrong")
    assert(keysOf("insert") == (batch.keySet diff dimKeys), "batch-only keys wrong")

    // contiguity + exact balance arithmetic for every matched key
    for ((k, vs) <- byKey if actionSets(k).contains("close")) {
      val close  = vs.find(_.getString(2) == "close").get
      val update = vs.find(_.getString(2) == "update").get
      assert(close.getString(5) == update.getString(4),
        s"key $k: close.valid_to != update.valid_from")
      assert(close.isNullAt(5) == false && update.isNullAt(5),
        s"key $k: the open version must be the update row")
      val expected = new java.math.BigDecimal(close.getDouble(3))
        .setScale(2, java.math.RoundingMode.HALF_UP)
        .add(batch(k))
      assert(math.abs(update.getDouble(3) - expected.doubleValue()) < 1e-9,
        s"key $k: merged balance ${update.getDouble(3)} != close+spend $expected")
    }
    Hygiene.release(spark)
  }
}
