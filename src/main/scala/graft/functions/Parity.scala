package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-engine (Spark ↔ DuckDB oracle) deterministic-aggregation helpers.
  *
  * Floating-point sums are order-dependent, and Spark's partial-aggregation
  * order differs run-to-run and engine-to-engine. Every aggregate we expose
  * therefore quantizes each operand to a DECIMAL (a deterministic per-value
  * cast: doubles never sit exactly on a half-ulp decimal boundary) and sums
  * in exact decimal arithmetic, which is associative/commutative and hence
  * shuffle-order-independent — the result is bit-identical on any cluster
  * size and matches DuckDB's `SUM(CAST(x AS DECIMAL(18,s)))` exactly.
  * This is also the 100 TB-safe formulation: partial (map-side) aggregation
  * stays enabled and no ordering constraint is imposed on the shuffle.
  */
object Parity {
  def dec(c: Column, scale: Int): Column = c.cast(DecimalType(18, scale))

  /** Exact, order-independent sum of a double column; final type DOUBLE. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(dec(c, scale)).cast(DoubleType)

  /** Exact average: decimal sum divided by count, in double. */
  def davg(c: Column, scale: Int = 4): Column =
    sum(dec(c, scale)).cast(DoubleType) / count(c)

  /** SQL-text counterparts for the DuckDB oracle. */
  def dsumSql(x: String, scale: Int = 4): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,$scale))) AS DOUBLE)"
  def davgSql(x: String, scale: Int = 4): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,$scale))) AS DOUBLE) / COUNT($x)"
}
