package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** k-th largest value with a HARD constant-size aggregation buffer.
  *
  * The relational spelling of "the C-th best score per query" is
  * `row_number() OVER (PARTITION BY qid ORDER BY score DESC)` — and that
  * window hands EVERY row of the qid to one reducer before it can rank a
  * single one: a per-qid partition that scans the corpus, the hot-reducer
  * shape that dies first at 100 TB. But the k-th largest is an aggregate,
  * not a ranking: it only needs the k best values, and a set of "k best"
  * partial states merges into another "k best" state. So this Aggregator
  * keeps a k-slot min-heap (the heap root is the smallest retained value =
  * the running k-th largest), reduces each row in O(log k), merges two
  * heaps in O(k log k), and rides Spark's partial aggregation: every map
  * task combines its rows down to ≤ k doubles BEFORE the shuffle, and the
  * reduce side streams those constant-size states together. Per-qid cost
  * is O(k) state and O(partials · k log k) merge work regardless of corpus
  * size — the same bounded-state discipline as [[BoundedCollectSet]].
  *
  * finish() returns the heap root: the k-th largest when the key saw ≥ k
  * values, the minimum (= every row qualifies for a top-k filter) when it
  * saw fewer. Callers broadcast-join the per-key result back and filter
  * `score >= kth - margin` — turning exact top-k-per-key into two linear
  * map-only passes plus one constant-width aggregation.
  */
final case class KthBuf(var n: Int, var heap: Array[Double])

/** Boxed input so a NULL aborts nothing: NULLs are skipped, the verdict
  * aggregates (min/max/percentile) all do the same. */
class KthLargest(k: Int)
    extends Aggregator[java.lang.Double, KthBuf, java.lang.Double] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: KthBuf = KthBuf(0, new Array[Double](k))

  private def siftUp(h: Array[Double], i0: Int): Unit = {
    var i = i0
    while (i > 0 && h((i - 1) / 2) > h(i)) {
      val p = (i - 1) / 2
      val t = h(p); h(p) = h(i); h(i) = t
      i = p
    }
  }

  private def siftDown(h: Array[Double], n: Int): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < n && h(l) < h(m)) m = l
      if (r < n && h(r) < h(m)) m = r
      if (m == i) done = true
      else {
        val t = h(m); h(m) = h(i); h(i) = t
        i = m
      }
    }
  }

  private def add(b: KthBuf, v: Double): KthBuf = {
    if (b.n < k) {
      b.heap(b.n) = v
      b.n += 1
      siftUp(b.heap, b.n - 1)
    } else if (v > b.heap(0)) {
      b.heap(0) = v
      siftDown(b.heap, b.n)
    }
    b
  }

  override def reduce(b: KthBuf, a: java.lang.Double): KthBuf =
    if (a == null) b else add(b, a.doubleValue)

  override def merge(x: KthBuf, y: KthBuf): KthBuf = {
    var i = 0
    while (i < y.n) { add(x, y.heap(i)); i += 1 }
    x
  }

  override def finish(b: KthBuf): java.lang.Double =
    if (b.n == 0) null else java.lang.Double.valueOf(b.heap(0))

  override def bufferEncoder: Encoder[KthBuf] = Encoders.product[KthBuf]
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}

object KthLargest {
  /** Column form: the k-th largest of `c` (the minimum when the group has
    * fewer than k rows; NULL inputs skipped, NULL for an all-NULL group). */
  def kthLargest(c: Column, k: Int): Column =
    udaf(new KthLargest(k), Encoders.DOUBLE)(c)
}
