package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: left rows at a point in time joined to right
  * rows whose [start, end) interval contains it, per key.
  *
  * Spark's optimizer plans `l.t BETWEEN r.start AND r.end` as an
  * inequality join — every left row meets every right row per key before
  * filtering, O(|left| x |right-per-key|) intermediate rows, which at
  * 100 TB is the same catastrophe as an as-of inequality join. This
  * operator buckets instead: each right interval EXPLODES into its
  * covered day-granules (bounded fan-out = interval length in days), the
  * join becomes a plain equi-join on (key, granule) — shuffle-friendly,
  * AQE-skew-splittable — and a residual predicate restores exact
  * sub-granule semantics. The trade is right-side row replication
  * (interval days) for the elimination of the quadratic join; for the
  * common "window of days/weeks" intervals that is a 7-30x bounded
  * fan-out vs an unbounded cross-per-key.
  *
  * Interval semantics: [startDate, endDateExclusive). Empty or inverted
  * intervals match nothing.
  */
object RangeJoin {

  def dateIntervalJoin(
      left: DataFrame, // contains leftKey + leftDate (DateType)
      right: DataFrame, // contains rightKey + startDate + endDateExclusive (DateType)
      leftKey: String,
      rightKey: String,
      leftDate: String,
      startDate: String,
      endDateExclusive: String
  ): DataFrame = {
    // fail fast on type drift: with TimestampType inputs the granule
    // equality would compare instants against midnight-stepped sequence
    // values and silently drop nearly every genuine match
    def requireDate(df: DataFrame, c: String): Unit =
      require(
        df.schema(c).dataType == org.apache.spark.sql.types.DateType,
        s"$c must be DateType (got ${df.schema(c).dataType}); to_date() timestamps first"
      )
    requireDate(left, leftDate)
    requireDate(right, startDate)
    requireDate(right, endDateExclusive)
    val days = right
      .filter(col(endDateExclusive) > col(startDate)) // empty intervals match nothing
      .withColumn(
        "__day",
        explode(
          sequence(
            col(startDate),
            date_sub(col(endDateExclusive), 1),
            expr("interval 1 day")
          )
        )
      )
    val joinCond: Column =
      left(leftKey) === days(rightKey) && left(leftDate) === days("__day")
    left
      .join(days, joinCond)
      // residual guard, DATAFRAME-QUALIFIED: unqualified col() would be
      // ambiguous whenever left and right share a column name. Exact even
      // if a caller swaps in a coarser granule.
      .filter(left(leftDate) >= days(startDate) && left(leftDate) < days(endDateExclusive))
      .drop(days("__day"))
  }
}
