package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Cosine similarity over two `array<float>` columns as a native Catalyst
  * expression WITH whole-stage codegen: the generated code is a tight
  * primitive double loop inlined into the surrounding stage (no
  * per-element expression interpretation, no UDF serialization, no
  * codegen-fallback boundary splitting the stage). Used as the fast
  * scoring kernel for similarity search; exact-decimal rescoring (see
  * LlmOps.dotArr) runs only on the candidates this passes.
  *
  * IEEE double arithmetic in a fixed (sequential) order — deterministic
  * across runs and cluster sizes for given inputs, but NOT decimal-exact;
  * treat results as scores, not oracle-comparable values.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"
  // analysis-time input check: registered session-wide as a SQL function,
  // so a mistyped call (e.g. array<double> literals) must fail with an
  // AnalysisException, not ClassCastException/garbage mid-job
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (VectorFunctions.isFloatArray(left.dataType) &&
      VectorFunctions.isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<float> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}"
      )
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  final double $xi = (double) $a.getFloat($i);
        |  final double $yi = (double) $b.getFloat($i);
        |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
        |}
        |${ev.value} = ($nx == 0.0 || $ny == 0.0)
        |  ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

/** One-pass int8-quantization error check: computes the absmax scale and
  * the max |x/s - round(x/s)| ratio in a single compiled traversal.
  *
  * Exists because composing the same check from higher-order functions
  * embeds the O(dim) scale aggregate inside the per-element lambda —
  * O(dim^2) interpreted work per row, which at real embedding widths
  * (1024+) dominates the job. This expression is O(dim) and whole-stage
  * codegen'd. The ratio is mathematically <= 0.5 regardless of rounding
  * tie direction, so the bound check is tie-break agnostic.
  */
case class Int8MaxErrRatioExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "int8_max_err_ratio"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (VectorFunctions.isFloatArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float>, got ${child.dataType.simpleString}"
      )
  }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) { mx = math.max(mx, math.abs(a.getFloat(i).toDouble)); i += 1 }
    val s = math.max(mx, 1e-12) / 127.0
    var r = 0.0
    i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble / s
      r = math.max(r, math.abs(x - math.round(x)))
      i += 1
    }
    r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val mx = ctx.freshName("mx")
      val s = ctx.freshName("s")
      val r = ctx.freshName("r")
      val x = ctx.freshName("x")
      s"""
        |final int $n = $a.numElements();
        |double $mx = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $mx = java.lang.Math.max($mx, java.lang.Math.abs((double) $a.getFloat($i)));
        |}
        |final double $s = java.lang.Math.max($mx, 1e-12) / 127.0;
        |double $r = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  final double $x = ((double) $a.getFloat($i)) / $s;
        |  $r = java.lang.Math.max($r, java.lang.Math.abs($x - java.lang.Math.round($x)));
        |}
        |${ev.value} = $r;
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  private[functions] def isFloatArray(dt: DataType): Boolean = dt match {
    case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, _) =>
      true
    case _ => false
  }

  /** The ONE list of custom SQL functions: (name, expression class, usage
    * doc, builder). Both injection paths — GraftExtensions (session
    * extensions) and register() (temp-function bootstrap) — consume this
    * list, so a kernel added here is present in BOTH, eliminating the
    * two-parallel-lists drift that once left int8_max_err_ratio
    * unregistered on one path. */
  val registry: Seq[(String, Class[_], String, Seq[Expression] => Expression)] = Seq(
    ("cosine_similarity", classOf[CosineSimilarityExpr],
      "cosine_similarity(a, b) - cosine similarity of two float arrays",
      exprs => CosineSimilarityExpr(exprs(0), exprs(1))),
    ("int8_max_err_ratio", classOf[Int8MaxErrRatioExpr],
      "int8_max_err_ratio(v) - max |x/s - round(x/s)| under absmax int8 quantization",
      exprs => Int8MaxErrRatioExpr(exprs(0))),
    ("simhash16", classOf[SimHash16Expr],
      "simhash16(tokens) - 16-bit SimHash fingerprint of an array<string> of tokens",
      exprs => SimHash16Expr(exprs(0))),
    ("simhash64", classOf[SimHash64Expr],
      "simhash64(tokens) - 64-bit SimHash fingerprint of an array<string> of tokens",
      exprs => SimHash64Expr(exprs(0))),
    ("int_sqdist", classOf[IntSqDistExpr],
      "int_sqdist(a, b) - exact integer squared distance of two bigint arrays",
      exprs => IntSqDistExpr(exprs(0), exprs(1))),
    ("int_argmin_sqdist", classOf[IntArgminSqdistExpr],
      "int_argmin_sqdist(x, centroids) - [argmin cluster, its int_sqdist] over the centroid matrix",
      exprs => IntArgminSqdistExpr(exprs(0), exprs(1))),
    ("cosine_top_clusters", classOf[CosineTopClustersExpr],
      "cosine_top_clusters(e, centroids, topn) - topn cluster ids by descending cosine",
      exprs => CosineTopClustersExpr(exprs(0), exprs(1), exprs(2))),
    ("bloom_might_contain", classOf[BloomMightContainExpr],
      "bloom_might_contain(s, filter) - Bloom membership probe of a string against a serialized filter literal",
      exprs => BloomMightContainExpr(exprs(0), exprs(1)))
  )

  /** Register SQL-callable vector functions on this session (idempotent —
    * skips when already present, avoiding "replaced a previously
    * registered function" warnings on every query invocation). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // guard EACH function separately: a session built with GraftExtensions
    // already has some of them, and skipping the rest on that evidence
    // left int8_max_err_ratio unregistered
    registry.foreach { case (name, _, _, builder) =>
      val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
      if (!reg.functionExists(id))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  /** SQL fragment form: register first, then use in expr()/selectExpr. */
  def cosineSimExpr(spark: SparkSession, aSql: String, bSql: String): Column = {
    register(spark)
    expr(s"cosine_similarity($aSql, $bSql)")
  }

  import org.apache.spark.sql.functions.{abs => fabs, _}

  /** Per-vector symmetric int8 quantization scale: max|v| / 127 (the
    * standard absmax scheme). Guarded against the zero vector. At 100 TB
    * this is THE storage move for embedding corpora — 4x smaller than
    * float32 with a bounded reconstruction error of scale/2 per element.
    */
  def int8Scale(v: Column): Column =
    greatest(
      aggregate(v, lit(0.0d), (acc, x) => greatest(acc, fabs(x.cast("double")))),
      lit(1e-12d)
    ) / 127.0d

  /** Quantize array<float> -> array<tinyint> with the given scale. */
  def int8Quantize(v: Column, scale: Column): Column =
    transform(v, x => round(x.cast("double") / scale).cast("tinyint"))

  /** Dequantize back to array<float>. */
  def int8Dequantize(q: Column, scale: Column): Column =
    transform(q, x => (x.cast("double") * scale).cast("float"))

  /** Max absolute reconstruction error across elements (for bound checks:
    * guaranteed <= scale/2 up to fp rounding). */
  def int8MaxError(v: Column, scale: Column): Column = {
    val deq = int8Dequantize(int8Quantize(v, scale), scale)
    aggregate(
      zip_with(v, deq, (a, b) => fabs(a.cast("double") - b.cast("double"))),
      lit(0.0d),
      (acc, x) => greatest(acc, x)
    )
  }
}
