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

object VectorFunctions {
  /** Register SQL-callable vector functions on this session (idempotent —
    * skips when already present, avoiding "replaced a previously
    * registered function" warnings on every query invocation). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_similarity")
    if (!reg.functionExists(id))
      reg.createOrReplaceTempFunction(
        "cosine_similarity",
        exprs => CosineSimilarityExpr(exprs(0), exprs(1)),
        "built-in"
      )
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
