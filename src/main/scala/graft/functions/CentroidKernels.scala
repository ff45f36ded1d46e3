package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Centroid-matrix kernels: score one row against ALL centroids in a
  * single compiled call, with the centroid matrix as ONE nested-array
  * literal (a single codegen reference object).
  *
  * Why this exists: the round-2..4 formulation inlined one expression per
  * centroid (`array(int_sqdist(x, array(lit...)) * k + c, ...)`), which
  * is k x dims literals in the generated source — past a few hundred
  * centroids that blows the JVM 64 KB method / constant-pool limits and
  * Spark silently falls back to interpreted eval (or fails). A real IVF
  * index has thousands of lists and kForCorpus-sized k-means runs k into
  * the hundreds at bench scale already. With the matrix as one literal,
  * generated-code size is CONSTANT in k: the codegen emits a single
  * static call against a `long[][]`/`float[][]` reference object.
  *
  * The matrix argument must be foldable (a literal — build it with
  * `typedLit`); it is evaluated once at plan/codegen time, never per row.
  */
object CentroidKernels {

  private[functions] def toLongMatrix(a: ArrayData): Array[Array[Long]] = {
    val k = a.numElements()
    val out = new Array[Array[Long]](k)
    var c = 0
    while (c < k) {
      out(c) = a.getArray(c).toLongArray()
      c += 1
    }
    out
  }

  private[functions] def toFloatMatrix(a: ArrayData): Array[Array[Float]] = {
    val k = a.numElements()
    val out = new Array[Array[Float]](k)
    var c = 0
    while (c < k) {
      out(c) = a.getArray(c).toFloatArray()
      c += 1
    }
    out
  }

  /** [argmin cluster, its sqdist]: integer-exact k-means assignment
    * against the centroid matrix, ties to the SMALLEST cluster id (strict
    * < with ascending scan — the same winner the earlier packed
    * `min(sqdist*k + c)` encoding produced). Returning the pair directly
    * removes the packed form's `*k` factor from the overflow contract:
    * the only long arithmetic is int_sqdist's own accumulation, so the
    * component bound no longer shrinks as k grows (the packed bound
    * sqrt(Long.Max/(dims*k))/2 capped k at ~360 for unit-scale 64-dim
    * embeddings — corpus-derived k crossed that just past the x10 bench
    * tier). Called from generated code. */
  def argminSqdist(x: ArrayData, mat: Array[Array[Long]]): ArrayData = {
    val k = mat.length
    var bestDist = Long.MaxValue
    var bestC = 0L
    var c = 0
    while (c < k) {
      val cent = mat(c)
      val n = math.min(x.numElements(), cent.length)
      var i = 0
      var acc = 0L
      while (i < n) {
        val d = x.getLong(i) - cent(i)
        acc += d * d
        i += 1
      }
      if (acc < bestDist) { bestDist = acc; bestC = c }
      c += 1
    }
    ArrayData.toArrayData(Array(bestC, bestDist))
  }

  /** Per-centroid squared norms, computed ONCE when the literal matrix is
    * materialized — the centroid matrix is a plan-time constant, so
    * recomputing its norms inside the per-row kernel would double the
    * multiply-add work of the hottest loop (N rows x k centroids x dim). */
  def centroidSqNorms(mat: Array[Array[Float]]): Array[Double] = {
    val out = new Array[Double](mat.length)
    var c = 0
    while (c < mat.length) {
      val cent = mat(c)
      var s = 0.0
      var j = 0
      while (j < cent.length) { val v = cent(j).toDouble; s += v * v; j += 1 }
      out(c) = s
      c += 1
    }
    out
  }

  /** Cluster ids ordered by descending (cosine(e, centroid), id), first
    * `topn` — ties break to the HIGHER cluster id, replicating the
    * lexicographic array_max / reverse(array_sort) semantics of the
    * per-centroid formulation it replaces. Zero-norm sides score 0.0
    * (CosineSimilarityExpr contract). `sqNorms` is centroidSqNorms(mat),
    * precomputed once per plan. Called from generated code. */
  def cosineTopClusters(
      e: ArrayData, mat: Array[Array[Float]], sqNorms: Array[Double], topn: Int): ArrayData = {
    val k = mat.length
    val cos = new Array[Double](k)
    var ne = 0.0
    val n0 = e.numElements()
    var i = 0
    while (i < n0) { val v = e.getFloat(i).toDouble; ne += v * v; i += 1 }
    var c = 0
    while (c < k) {
      val cent = mat(c)
      val n = math.min(n0, cent.length)
      var dot = 0.0
      var j = 0
      while (j < n) {
        dot += e.getFloat(j).toDouble * cent(j).toDouble
        j += 1
      }
      // norms over the common prefix only, matching CosineSimilarityExpr's
      // min-length contract (equal-width vectors in practice). The
      // precomputed full-length norms apply on the fast path; a ragged
      // pair recomputes the truncated side's prefix norm.
      var nc = sqNorms(c)
      if (n < cent.length) {
        nc = 0.0; var t = 0
        while (t < n) { val v = cent(t).toDouble; nc += v * v; t += 1 }
      }
      var nep = ne
      if (n < n0) {
        nep = 0.0; var t = 0
        while (t < n) { val v = e.getFloat(t).toDouble; nep += v * v; t += 1 }
      }
      cos(c) = if (nep == 0.0 || nc == 0.0) 0.0 else dot / (math.sqrt(nep) * math.sqrt(nc))
      c += 1
    }
    val m = math.min(math.max(topn, 0), k)
    val out = new Array[Int](m)
    if (m == 1) {
      // the corpus-assignment hot path: linear argmax, no sort. The
      // comparison is EXACTLY the sort path's comparator — key (-cos, -i)
      // ascending under TotalOrdering (Double.compare) — so the two paths
      // agree BY CONSTRUCTION on every input, including NaN (ranks worst:
      // -NaN is NaN, greatest under total order) and -0.0 vs 0.0. A
      // primitive >/== here, or Double.compare on the un-negated cosines,
      // would rank a NaN cosine best in this path but worst in the sort
      // path — an Inf/NaN embedding would be STORED in a list the probe
      // never visits.
      var bestC = 0
      c = 1
      while (c < k) {
        val cmp = java.lang.Double.compare(-cos(c), -cos(bestC))
        if (cmp < 0 || (cmp == 0 && c > bestC)) bestC = c
        c += 1
      }
      out(0) = bestC
    } else if (m > 1) {
      val idx = Array.range(0, k)
        .sortBy(i => (-cos(i), -i))(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int))
      var t = 0
      while (t < m) { out(t) = idx(t); t += 1 }
    }
    ArrayData.toArrayData(out)
  }
}

/** `int_argmin_sqdist(x, centroids)` -> array<bigint> [cluster, dist]:
  * integer-exact k-means assignment against a literal centroid matrix —
  * see CentroidKernels.argminSqdist. x is array<bigint> (fixed-point),
  * centroids a FOLDABLE, NON-NULL array<array<bigint>>. Overflow
  * contract: int_sqdist's own bound (|component| <
  * sqrt(Long.Max/dims)/2), independent of k — KMeans.fit asserts the max
  * component magnitude once per fit. */
case class IntArgminSqdistExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "int_argmin_sqdist"

  override def checkInputDataTypes(): TypeCheckResult = {
    def longArr(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    val rightOk = right.dataType match {
      case ArrayType(inner, _) if longArr(inner) => true
      case _                                     => false
    }
    if (!longArr(left.dataType) || !rightOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<bigint>, array<array<bigint>>), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}"
      )
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a literal (foldable) centroid matrix"
      )
    else if (right.eval() == null)
      // foldable NULL would otherwise NPE out of the lazy matrix at first
      // eval — fail the analysis instead (cheap: right is a literal)
      TypeCheckResult.TypeCheckFailure(s"$prettyName centroid matrix must not be null")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val matrix: Array[Array[Long]] =
    CentroidKernels.toLongMatrix(right.eval().asInstanceOf[ArrayData])

  override def nullable: Boolean = left.nullable

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val x = left.eval(input)
    if (x == null) null
    else CentroidKernels.argminSqdist(x.asInstanceOf[ArrayData], matrix)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    // ONE reference object regardless of k — constant generated-code size
    val matRef = ctx.addReferenceObj("centroidMatrix", matrix, "long[][]")
    val xGen = left.genCode(ctx)
    ev.copy(code = code"""
        ${xGen.code}
        boolean ${ev.isNull} = ${xGen.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.CentroidKernels.argminSqdist(${xGen.value}, $matRef);
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

/** `cosine_top_clusters(embedding, centroids, topn)`: the `topn` cluster
  * ids nearest by cosine, descending, ties to the higher id — see
  * CentroidKernels.cosineTopClusters. embedding is array<float>,
  * centroids a FOLDABLE array<array<float>>, topn a FOLDABLE int. */
case class CosineTopClustersExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cosine_top_clusters"

  override def checkInputDataTypes(): TypeCheckResult = {
    val embOk = VectorFunctions.isFloatArray(first.dataType)
    val matOk = second.dataType match {
      case ArrayType(inner, _) if VectorFunctions.isFloatArray(inner) => true
      case _                                                          => false
    }
    if (!embOk || !matOk || third.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float>, array<array<float>>, int), got " +
          s"${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
          s"${third.dataType.simpleString}"
      )
    else if (!second.foldable || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires literal (foldable) centroid matrix and topn"
      )
    else if (second.eval() == null || third.eval() == null)
      // foldable NULLs would otherwise NPE (matrix) or unbox to 0 (topn,
      // silently returning empty arrays) — fail the analysis instead
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName centroid matrix and topn must not be null"
      )
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val matrix: Array[Array[Float]] =
    CentroidKernels.toFloatMatrix(second.eval().asInstanceOf[ArrayData])
  @transient private lazy val sqNorms: Array[Double] =
    CentroidKernels.centroidSqNorms(matrix)
  @transient private lazy val topn: Int = third.eval().asInstanceOf[Int]

  override def nullable: Boolean = first.nullable

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val e = first.eval(input)
    if (e == null) null
    else CentroidKernels.cosineTopClusters(e.asInstanceOf[ArrayData], matrix, sqNorms, topn)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val matRef = ctx.addReferenceObj("centroidMatrix", matrix, "float[][]")
    val normRef = ctx.addReferenceObj("centroidSqNorms", sqNorms, "double[]")
    val eGen = first.genCode(ctx)
    ev.copy(code = code"""
        ${eGen.code}
        boolean ${ev.isNull} = ${eGen.isNull};
        ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.CentroidKernels.cosineTopClusters(
            ${eGen.value}, $matRef, $normRef, $topn);
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression,
      newSecond: Expression,
      newThird: Expression
  ): Expression = copy(first = newFirst, second = newSecond, third = newThird)
}
