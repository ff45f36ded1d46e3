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
  * Mechanics: the left (large, skewed) side gets a salt in [0, n) derived
  * from a per-row unique id — NOT from hashing row contents, since fully
  * duplicate left rows (a common shape of hot-key skew) would then all
  * land in one salt bucket and the skew would not spread at all. Inner
  * equi-join correctness does not require a deterministic salt. The right
  * side is replicated n times, one copy per salt value; the join key
  * becomes (key, salt), spreading each hot key over n reducers at the
  * cost of n-times replication of the (small) right side.
  */
object SkewJoin {
  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltBuckets: Int = 8
  ): DataFrame = {
    require(saltBuckets > 0)
    require(
      !left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "saltedInnerJoin reserves the __salt column name"
    )
    val saltedLeft = left.withColumn(
      "__salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)).cast("int")
    )
    val saltedRight = right
      .withColumn("__salt", explode(array((0 until saltBuckets).map(lit): _*)))
    saltedLeft
      .join(saltedRight, Seq(key, "__salt"))
      .drop("__salt")
  }
}
