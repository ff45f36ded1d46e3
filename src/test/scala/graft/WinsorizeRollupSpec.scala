package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the t40 winsorization kernel against hand-computed quantile_cont
  * values, and — the verdict-gate discipline — proves q48's `match_ok` is
  * falsifiable by feeding the identical comparison a poisoned incremental
  * merge (a month double-counted). */
class WinsorizeRollupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("winsorizeStats matches hand-computed interpolated bounds and mean") {
    import spark.implicits._
    // v = 1..20: quantile_cont(0.05) = 1.95, quantile_cont(0.95) = 19.05,
    // one doc clips in each tail, inner sum = 2+..+19 = 189,
    // win_mean = (189 + 1.95 + 19.05) / 20 = 10.5
    val df = (1L to 20L).map(v => ("s", v)).toDF("source", "v")
    val r = graft.queries.LlmOps.winsorizeStats(spark, df, 0.05, 0.95).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 20L)
    assert(math.abs(row.getDouble(2) - 1.95) < 1e-12, s"p_lo ${row.getDouble(2)}")
    assert(math.abs(row.getDouble(3) - 19.05) < 1e-12, s"p_hi ${row.getDouble(3)}")
    assert(row.getLong(4) == 1L && row.getLong(5) == 1L)
    assert(math.abs(row.getDouble(6) - 10.5) < 1e-12, s"win_mean ${row.getDouble(6)}")
    Hygiene.release(spark)
  }

  test("winsorizeStats at exact-rank quantiles takes the rank value with no interpolation") {
    import spark.implicits._
    // v = 0..20 (n=21): h = 20*0.05 = 1 exactly, so the bounds are the
    // rank-2/rank-20 VALUES (1.0 and 19.0) with no FP interpolation;
    // exactly one doc clips per tail; win_mean = (190 + 1 + 19)/21 = 10
    val df = (0L to 20L).map(v => ("s", v)).toDF("source", "v")
    val row = graft.queries.LlmOps.winsorizeStats(spark, df, 0.05, 0.95).collect().head
    assert(row.getDouble(2) == 1.0 && row.getDouble(3) == 19.0)
    assert(row.getLong(4) == 1L && row.getLong(5) == 1L)
    assert(row.getDouble(6) == 10.0)
    Hygiene.release(spark)
  }

  test("q48: verdict green on the real merge, touched and untouched both present") {
    val rows = graft.queries.Registry.queries("q48_incremental_rollup")(spark, TestSpark.sf0001)
      .collect()
    assert(rows.forall(_.getBoolean(4)), "incremental merge disagreed with full recompute")
    assert(rows.exists(_.getBoolean(3)) && rows.exists(!_.getBoolean(3)),
      "need both touched and untouched months for the gate to mean anything")
    Hygiene.release(spark)
  }

  test("q48: match_ok reads FALSE under a poisoned merge (delta double-counted)") {
    val orders = Tables.orders(spark, TestSpark.sf0001)
    def rollup(src: org.apache.spark.sql.DataFrame) =
      src.groupBy(date_trunc("month", col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    val cutoff = lit("2001-01-01").cast("timestamp")
    val snap = rollup(orders.filter(col("o_orderdate") < cutoff))
      .withColumnRenamed("n", "sn").withColumnRenamed("rev", "srev")
    val delta = rollup(orders.filter(col("o_orderdate") >= cutoff))
      .withColumnRenamed("n", "dn").withColumnRenamed("rev", "drev")
    val zero = lit(0).cast("decimal(18,2)")
    val poisoned = snap.join(delta, Seq("m"), "full_outer")
      .select(col("m"),
        (coalesce(col("sn"), lit(0L)) + lit(2L) * coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("srev"), zero) + coalesce(col("drev"), zero)
          + coalesce(col("drev"), zero)).as("rev"))
    val full = rollup(orders)
      .withColumnRenamed("n", "fn").withColumnRenamed("rev", "frev")
    val verdicts = poisoned.join(full, "m")
      .select((col("n") === col("fn") && col("rev") === col("frev")).as("match_ok"))
      .collect().map(_.getBoolean(0))
    assert(verdicts.exists(!_), "double-counted delta still matched full — the gate is vacuous")
    assert(verdicts.exists(identity), "untouched months must still match")
    Hygiene.release(spark)
  }
}
