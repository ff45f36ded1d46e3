package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for pathologically skewed keys.
  *
  * AQE's skew-join splitting (enabled in GraftSession) handles most skew
  * at runtime; explicit salting remains the tool when one key dominates so
  * hard that even split partitions bottleneck a single join key's
  * build side. Semantics: inner equi-join, identical results to
  * `left.join(right, keys)` — verified by SkewJoinSpec.
  *
  * Mechanics: the left (large, skewed) side gets a deterministic salt in
  * [0, n) derived from a hash of its other columns; the right side is
  * replicated n times, one copy per salt value. The join key becomes
  * (key, salt), spreading each hot key over n reducers at the cost of
  * n-times replication of the (small) right side — choose n accordingly.
  */
object SkewJoin {
  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltBuckets: Int = 8
  ): DataFrame = {
    require(saltBuckets > 0)
    // salt from all left columns: deterministic, uniform enough; xxhash64
    // is codegen'd and cheap
    val saltedLeft = left.withColumn(
      "__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(saltBuckets.toLong)).cast("int")
    )
    val saltedRight = right
      .withColumn("__salt", explode(array((0 until saltBuckets).map(lit): _*)))
    saltedLeft
      .join(saltedRight, Seq(key, "__salt"))
      .drop("__salt")
  }
}
