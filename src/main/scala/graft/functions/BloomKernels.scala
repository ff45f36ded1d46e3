package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom membership probe as a native Catalyst expression with
  * whole-stage codegen — the fast "definitely new?" pre-filter in front
  * of an expensive exact-membership join (d25).
  *
  * `right` is the SERIALIZED filter as a foldable binary literal (from
  * [[BloomKernels.serialize]] over `df.stat.bloomFilter`'s result): a
  * ~120 KB blob for 10^5 expected items at 1% fpp — model-artifact
  * sized, the same transport class as broadcast centroids/codebooks; at
  * 10^9 items it is ~1.2 GB and the right transport becomes a sharded
  * filter or a real broadcast join — the literal is for the blob
  * regime. Each task deserializes the blob ONCE (lazy transient field;
  * the generated code calls back into this instance via the codegen
  * reference array, so all rows of a task share the parsed bitset) and
  * probes with `mightContainString`, matching the byte-level hashing of
  * `DataFrameStatFunctions.bloomFilter`'s build side. Spark's Bloom
  * hashes are fixed-seed, so for a given (build set, params) the
  * probe's answer is fully DETERMINISTIC — which is what lets d25 gate
  * the no-false-negative property per row cross-engine.
  */
case class BloomMightContainExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (StringType, BinaryType) if right.foldable =>
        // a null or empty serialized-filter literal would otherwise NPE
        // in BloomFilter.readFrom at the first eval/codegen probe — an
        // opaque executor-side error; misuse must fail AT ANALYSIS with
        // this expression's own message (r13, ADVICE closure). Safe to
        // eval here: the operand is foldable by the guard above.
        right.eval(null) match {
          case null =>
            TypeCheckResult.TypeCheckFailure(
              s"$prettyName: the serialized filter literal is null")
          case b: Array[Byte] if b.isEmpty =>
            TypeCheckResult.TypeCheckFailure(
              s"$prettyName: the serialized filter literal is empty")
          case _ => TypeCheckResult.TypeCheckSuccess
        }
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (string, foldable binary filter), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(
      right.eval(null).asInstanceOf[Array[Byte]]))

  /** Task-side probe — also the codegen entry point. */
  def probe(s: org.apache.spark.unsafe.types.UTF8String): Boolean =
    bloom.mightContainString(s.toString)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) null
    else java.lang.Boolean.valueOf(
      probe(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val self =
      ctx.addReferenceObj("bloomExpr", this, classOf[BloomMightContainExpr].getName)
    val childGen = left.genCode(ctx)
    ev.copy(code = code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = $self.probe(${childGen.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomKernels {

  /** `BloomFilter` → bytes (the binary-literal transport). */
  def serialize(bloom: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    out.toByteArray
  }

  /** `bloom.mightContain(col)` as a Column. Resolves through the
    * session function registry (`VectorFunctions.register` /
    * GraftExtensions), like every other compiled kernel here. */
  def mightContain(bytes: Array[Byte], c: Column): Column =
    org.apache.spark.sql.functions.call_function(
      "bloom_might_contain", c, org.apache.spark.sql.functions.lit(bytes))
}
