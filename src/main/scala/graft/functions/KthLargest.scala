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
  * aggregates (min/max/percentile) all do the same. NaN scores are
  * skipped too: the heap's raw `<`/`>` comparisons are undefined under
  * NaN (every comparison is false, so a NaN admitted while the heap is
  * under-full would corrupt the sift invariants and could displace valid
  * values). Spark's window ordering ranks NaN greater than every double;
  * here a NaN cosine can only come from a degenerate (NaN-poisoned)
  * embedding, and "a meaningless score outranks every real one" is the
  * wrong semantic for a top-k prefilter — exclusion is deliberate, and
  * [[TopKVids]] documents the same choice. */
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
    if (a == null || a.isNaN) b else add(b, a.doubleValue)

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

/** [[TopKVids]]'s buffer: parallel k-slot arrays, a min-heap on the
  * (score asc, vid desc) priority — the root is the WORST retained pair. */
final case class TopKVidsBuf(var n: Int, var scores: Array[Double], var vids: Array[Long])
final case class TopVids(vids: Seq[Long])

/** Exact top-k (score, vid) pairs per group in ONE pass — the
  * whole-answer sibling of [[KthLargest]]: where the kth-boundary
  * aggregate needs a second scan (broadcast the boundary back, re-filter,
  * rank the survivors), this keeps the k best PAIRS in the constant-size
  * buffer itself, so a per-key top-k costs one linear scan with map-side
  * partial combine and no window anywhere. Use it when the ranking score
  * IS the scanned column (e11's dequantized cosine, e12's integer L2);
  * the two-pass kth form remains the right kernel when survivors must be
  * re-scored by a more exact kernel (e01's exact-decimal rescore needs
  * the margin superset, which a fixed-k heap cannot hold).
  *
  * Ordering: highest score first, ties broken by SMALLEST vid — total,
  * so the result is deterministic. Ascending (distance) rankings ride
  * score negation, like the kth kernel. NULL and NaN scores are skipped:
  * `worse`'s raw `<`/`==` is undefined under NaN (a NaN admitted while
  * the heap is under-full breaks the sift invariants and can displace
  * valid pairs). This deliberately diverges from the row_number window
  * it replaces — Spark ranks NaN greater than every double — because a
  * NaN score only arises from a NaN-poisoned embedding and must not
  * outrank real neighbors; [[KthLargest]] makes the same choice. For
  * integral scores cast to double the ranking is exact while |score| <
  * 2^53 (beyond it, sub-ulp ties fall to the vid tiebreak — document the
  * bound at the call site, as e12 does).
  *
  * finish() emits the vids best-first (rank order = position). */
class TopKVids(k: Int)
    extends Aggregator[(java.lang.Double, java.lang.Long), TopKVidsBuf, TopVids] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: TopKVidsBuf = TopKVidsBuf(0, new Array[Double](k), new Array[Long](k))

  /** Is pair 1 WORSE than pair 2 (lower score, or equal score with a
    * larger vid)? The heap keeps the k best, so the root is the worst. */
  private def worse(s1: Double, v1: Long, s2: Double, v2: Long): Boolean =
    s1 < s2 || (s1 == s2 && v1 > v2)

  private def swap(b: TopKVidsBuf, i: Int, j: Int): Unit = {
    val ts = b.scores(i); b.scores(i) = b.scores(j); b.scores(j) = ts
    val tv = b.vids(i); b.vids(i) = b.vids(j); b.vids(j) = tv
  }

  private def siftUp(b: TopKVidsBuf, i0: Int): Unit = {
    var i = i0
    while (i > 0 && worse(b.scores(i), b.vids(i), b.scores((i - 1) / 2), b.vids((i - 1) / 2))) {
      swap(b, i, (i - 1) / 2)
      i = (i - 1) / 2
    }
  }

  private def siftDown(b: TopKVidsBuf): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < b.n && worse(b.scores(l), b.vids(l), b.scores(m), b.vids(m))) m = l
      if (r < b.n && worse(b.scores(r), b.vids(r), b.scores(m), b.vids(m))) m = r
      if (m == i) done = true
      else { swap(b, i, m); i = m }
    }
  }

  private def add(b: TopKVidsBuf, s: Double, v: Long): TopKVidsBuf = {
    if (b.n < k) {
      b.scores(b.n) = s; b.vids(b.n) = v
      b.n += 1
      siftUp(b, b.n - 1)
    } else if (worse(b.scores(0), b.vids(0), s, v)) {
      b.scores(0) = s; b.vids(0) = v
      siftDown(b)
    }
    b
  }

  override def reduce(b: TopKVidsBuf, a: (java.lang.Double, java.lang.Long)): TopKVidsBuf =
    if (a._1 == null || a._2 == null || a._1.isNaN) b
    else add(b, a._1.doubleValue, a._2.longValue)

  override def merge(x: TopKVidsBuf, y: TopKVidsBuf): TopKVidsBuf = {
    var i = 0
    while (i < y.n) { add(x, y.scores(i), y.vids(i)); i += 1 }
    x
  }

  override def finish(b: TopKVidsBuf): TopVids = {
    val pairs = (0 until b.n).map(i => (b.scores(i), b.vids(i)))
      .sortBy { case (s, v) => (-s, v) }
    TopVids(pairs.map(_._2))
  }

  override def bufferEncoder: Encoder[TopKVidsBuf] = Encoders.product[TopKVidsBuf]
  override def outputEncoder: Encoder[TopVids] = Encoders.product[TopVids]
}

object TopKVids {
  /** Column form: the top-k vids of the group by (score DESC, vid ASC),
    * best first. */
  def topKVids(score: Column, vid: Column, k: Int): Column =
    udaf(new TopKVids(k), Encoders.tuple(Encoders.DOUBLE, Encoders.LONG))(score, vid)
}
