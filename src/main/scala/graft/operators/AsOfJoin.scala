package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row whose time is
  * <= the left row's time, per join key.
  *
  * Implemented as the union + ordered-window "last carried value" trick
  * rather than an inequality join: an inequality join materializes
  * O(left x right-per-key) intermediate rows before picking one winner,
  * which at 100 TB is a catastrophic shuffle; the union formulation is a
  * single hash shuffle on the key plus one sort within partitions —
  * the same cost profile as a sort-merge join, and AQE-skew-splittable.
  *
  * Tie semantics: right rows at exactly the left row's time DO match
  * (at-or-before); among right rows sharing the max time, the one with the
  * greatest `rightTieBreak` wins (deterministic).
  */
object AsOfJoin {
  def latestAtOrBefore(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightTieBreak: String,
      payload: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    // Shared layout: key, t, tag (0 = right/emitter, 1 = left/receiver),
    // tiebreak, left columns (null on right rows), payload (null on left).
    val l = left
      .withColumn("__key", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
      .withColumn("__tb", lit(null).cast("long"))
    val lShaped = payload.foldLeft(l)((df, p) =>
      df.withColumn(p, lit(null).cast(right.schema(p).dataType))
    )
    val r0 = right
      .withColumn("__key", col(rightKey))
      .withColumn("__t", col(rightTime))
      .withColumn("__tag", lit(0))
      .withColumn("__tb", col(rightTieBreak).cast("long"))
    val rShaped = leftCols.foldLeft(r0)((df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    )
    val cols = Seq("__key", "__t", "__tag", "__tb") ++ leftCols.filterNot(
      Seq(leftKey, leftTime).contains
    ) ++ payload
    val unioned =
      lShaped.select(cols.map(col): _*).unionByName(rShaped.select(cols.map(col): _*))

    // Right rows sort before left rows at equal time (inclusive at-or-
    // before); among equal-time right rows the max tiebreak lands last.
    val w = Window
      .partitionBy("__key")
      .orderBy(col("__t").asc, col("__tag").asc, col("__tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = payload.foldLeft(unioned)((df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    )
    carried
      .filter(col("__tag") === 1)
      .withColumn(leftKey, col("__key"))
      .withColumn(leftTime, col("__t"))
      .select((leftCols ++ payload).map(col): _*)
  }
}
