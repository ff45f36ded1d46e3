package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** collect_set with a HARD per-key size bound.
  *
  * Plain collect_set materializes every distinct value for a key inside one
  * aggregation buffer, so a single pathological key (a stop-shingle shared
  * by 1M documents, a bot user_id) grows an unbounded in-memory list on one
  * reducer — the classic skew OOM. This aggregator caps the buffer at
  * maxSize+1 distinct elements: once a key exceeds the bound it is marked
  * overflowed and every further element is dropped in O(1), on the map side
  * as well as after the shuffle (partial aggregation keeps the bound on
  * both). Overflowed keys emit an EMPTY array — callers that cap by
  * document frequency (df <= maxSize) filter on size >= 1, which is exact:
  * a non-overflowed key's set is complete, an overflowed key provably has
  * df > maxSize.
  *
  * This makes "group by key, keep keys with at most N members, with their
  * members" a ONE-shuffle, skew-proof plan — replacing the count-groupBy +
  * filter + join-back chain (three shuffles) that the same cap needs when
  * expressed relationally.
  */
final case class BoundedSetBuf(var overflow: Boolean, var items: List[Long])

/** Input is boxed java.lang.Long, NOT primitive Long: the primitive
  * encoder is non-nullable, so a NULL in the aggregated column would abort
  * the whole job ("Null value appeared in non-nullable field") — while
  * collect_set, whose semantics this bounds, silently skips NULLs. reduce
  * skips them the same way. */
class BoundedCollectSet(maxSize: Int)
    extends Aggregator[java.lang.Long, BoundedSetBuf, Seq[Long]] {
  require(maxSize > 0)

  override def zero: BoundedSetBuf = BoundedSetBuf(overflow = false, Nil)

  private def add(b: BoundedSetBuf, a: Long): BoundedSetBuf =
    if (b.overflow || b.items.contains(a)) b // contains is O(size<=maxSize)
    else if (b.items.size >= maxSize) { b.overflow = true; b.items = Nil; b }
    else { b.items = a :: b.items; b }

  override def reduce(b: BoundedSetBuf, a: java.lang.Long): BoundedSetBuf =
    if (a == null) b else add(b, a.longValue) // NULLs skipped, like collect_set

  override def merge(x: BoundedSetBuf, y: BoundedSetBuf): BoundedSetBuf =
    if (x.overflow) x
    else if (y.overflow) y
    else y.items.foldLeft(x)(add)

  override def finish(b: BoundedSetBuf): Seq[Long] =
    if (b.overflow) Nil else b.items

  override def bufferEncoder: Encoder[BoundedSetBuf] = Encoders.product[BoundedSetBuf]
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object BoundedCollectSet {
  /** Column form: bounded-set aggregate of a Long column (NULLs skipped,
    * matching collect_set). */
  def boundedSet(c: Column, maxSize: Int): Column =
    udaf(new BoundedCollectSet(maxSize), Encoders.LONG)(c)
}
