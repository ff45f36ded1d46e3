package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact IN-GROUP rank — the grouped generalization of the
  * t21 global-rank machinery (LlmOps.rankedBy / withGlobalRank), for
  * "rank within a low-cardinality group" queries (q22's per-priority
  * percentiles, q37's per-priority quartiles) whose naive spelling —
  * `row_number() OVER (PARTITION BY grp ORDER BY …)` — hands each group
  * (corpus ÷ #groups rows) to ONE reducer. WindowBoundSpec bans that
  * shape suite-wide; this operator is the sanctioned replacement.
  *
  * Shape: one range exchange on (grp, orderKeys…) gives `numParts`
  * monotonic partitions, each holding a contiguous slice of one-or-more
  * (grp, value) runs; a local row_number per (pid, grp) — bounded by the
  * range partition's size, never the group — then per-(pid, grp) counts
  * (metadata: ≤ numParts·#groups rows) turn into exclusive per-group
  * prefix offsets over pid order and broadcast back:
  * `grank = offset(pid, grp) + local rn`, `gn` = group size. Whatever
  * boundaries the range sampler picks, offset + local rank IS the
  * in-group rank, so the result is invariant to `numParts` AND to the
  * sampling (RankParitySpec pins two widths to identical output) —
  * `numParts` is purely the scale-out knob (defaultParallelism from the
  * caller: 32 locally, cluster-width on a real deployment).
  *
  * The ranked frame is read twice (counts + final join) and both reads
  * must see ONE partition assignment, not two samplings of the range
  * boundaries — localCheckpoint(true) materializes (input cols + pid +
  * rn) once, the same single-evaluation discipline LlmOps.nllBuckets
  * documents. Rows with equal (grp, orderKeys) may straddle a boundary;
  * the offsets still produce a valid permutation rank, so callers that
  * need a DETERMINISTIC rank (not just deterministic rank-selected
  * values) must include a unique tiebreaker in orderKeys.
  *
  * Output: input columns + `grank` (1-based in-group rank) + `gn`
  * (group row count). Input columns named pid/rn/c/off/grank/gn would
  * collide with the internals — rename first.
  */
object Ranks {
  def groupedRank(df: DataFrame, grp: String, numParts: Int, orderKeys: Column*): DataFrame = {
    val keys = col(grp) +: orderKeys
    val ranked = df
      .repartitionByRange(numParts, keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("pid", spark_partition_id())
      .withColumn(
        "rn",
        row_number().over(Window.partitionBy(col("pid"), col(grp)).orderBy(orderKeys: _*))
      )
      .localCheckpoint(true)
    val counts = ranked.groupBy(col("pid"), col(grp)).agg(count(lit(1)).as("c"))
    val offs = counts
      .withColumn(
        "off",
        coalesce(
          sum(col("c")).over(
            Window
              .partitionBy(grp)
              .orderBy("pid")
              .rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
    val totals = counts.groupBy(col(grp)).agg(sum(col("c")).as("gn"))
    ranked
      .join(broadcast(offs.select(col("pid"), col(grp), col("off"))), Seq("pid", grp))
      .join(broadcast(totals), Seq(grp))
      .withColumn("grank", col("off") + col("rn"))
      .drop("pid", "rn", "off")
  }

  /** Spark/DuckDB `ntile(k)` from an in-group rank, in closed form: with
    * n rows and k tiles, the first n % k tiles hold ⌈n/k⌉ rows and the
    * rest ⌊n/k⌋ — pure integer arithmetic, exact in both engines (the
    * q < 1 branch guard: when n < k every tile is one row and the else
    * branch — whose divisor q would be 0 — is unreachable). */
  def ntileFromRank(grank: Column, gn: Column, k: Int): Column = {
    // Column `/` is DOUBLE division; integral div rides the pmod trick:
    // (a - a%b) is an exact multiple of b, and exact-multiple ÷ b is an
    // exact double op for a < 2^53 (9e15 rows per group — beyond any
    // physical corpus). All operands here are non-negative.
    def idiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long")
    val q = idiv(gn, lit(k))
    val r = gn - q * k
    val big = (q + 1) * r // rows living in the (q+1)-sized tiles
    when(grank <= big, idiv(grank - 1, q + 1) + 1)
      .otherwise(r + idiv(grank - big - 1, q) + 1)
      .cast("int")
  }
}
