package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** One-pass SimHash fingerprint over a token array as a native Catalyst
  * expression with whole-stage codegen.
  *
  * Replaces the explode + grouped-sum formulation (one row per token
  * occurrence, one hash Exchange over ~total-token-count rows) with a
  * narrow per-row kernel: fingerprints come out of the scan stage with
  * ZERO shuffle, which at 100 TB is the difference between a map-only
  * pass and shuffling the tokenized corpus. Semantics are bit-identical
  * to the grouped form (and to the DuckDB oracle): per token, md5; for
  * each of the first 16 hex nibbles add +1 when the nibble's high bit is
  * set else -1 over token OCCURRENCES; fingerprint bit i set iff sum_i
  * is strictly positive. Empty tokens are skipped; an all-empty/empty
  * array yields NULL so callers can drop token-less docs exactly like
  * the exploded form did (explode of an empty array emits no row).
  *
  * 16-bit here to match the test-scale pipeline (d04/d05); at corpus
  * scale the same kernel widens to 64 bits by reading 16 nibbles more —
  * the shape (narrow projection, no shuffle) is unchanged.
  */
case class SimHash16Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash16"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<string>, got ${other.simpleString}"
        )
    }
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val r = TextKernels.simhash16(v.asInstanceOf[ArrayData])
      if (r < 0) null else Integer.valueOf(r)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val r = ctx.freshName("simhash")
    ev.copy(code = code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        int ${ev.value} = 0;
        if (!${childGen.isNull}) {
          final int $r = graft.functions.TextKernels.simhash16(${childGen.value});
          if ($r >= 0) { ${ev.isNull} = false; ${ev.value} = $r; }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash — the production width. 16 bits (SimHash16Expr) is a
  * test-scale toy: at 2^16 possible fingerprints any corpus beyond ~10^4
  * docs drowns Hamming<=3 "near-dups" in random collisions; at 64 bits
  * the collision floor moves past any realistic corpus, which is why
  * published dedup recipes fingerprint at 64 (or 128) bits.
  *
  * Bit convention (shared with the DuckDB oracle twin in LlmOps): per
  * token, md5; fingerprint bit i (0..63) is voted by bit (3 - (i & 3))
  * of hex-nibble (i>>2) — i.e. the first 16 nibbles of the digest read
  * high-bit-first, 4 fingerprint bits per nibble. Bit i of the result is
  * set iff the vote sum over token OCCURRENCES is strictly positive.
  * Empty tokens are skipped; no non-empty token yields NULL (callers
  * drop token-less docs exactly like the exploded form / UNNEST oracle).
  *
  * Same execution shape as the 16-bit kernel: a narrow per-row compiled
  * projection straight out of the scan — ZERO shuffle at any corpus
  * size. Returns boxed Long from the static kernel (null = no token);
  * one box per row is noise next to the per-token md5.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<string>, got ${other.simpleString}"
        )
    }
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else TextKernels.simhash64(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val r = ctx.freshName("simhash")
    ev.copy(code = code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${childGen.isNull}) {
          final java.lang.Long $r = graft.functions.TextKernels.simhash64(${childGen.value});
          if ($r != null) { ${ev.isNull} = false; ${ev.value} = $r.longValue(); }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextKernels {
  private val mdPool: ThreadLocal[MessageDigest] =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
    }

  /** SimHash-16 of a token array; -1 when no non-empty token (the caller
    * maps that to NULL). Called from generated code — keep it a static
    * forwarder (plain object method, no companion class). */
  def simhash16(arr: ArrayData): Int = {
    val counts = new Array[Int](16)
    val n = arr.numElements()
    var any = false
    var j = 0
    while (j < n) {
      val tok = arr.getUTF8String(j)
      if (tok != null && tok.numBytes() > 0) {
        any = true
        val md = mdPool.get()
        md.reset()
        val digest = md.digest(tok.getBytes)
        var i = 0
        while (i < 16) {
          val b = digest(i >> 1)
          val nib = if ((i & 1) == 0) (b >> 4) & 0xf else b & 0xf
          if ((nib & 0x8) != 0) counts(i) += 1 else counts(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    if (!any) -1
    else {
      var fp = 0
      var i = 0
      while (i < 16) {
        if (counts(i) > 0) fp |= 1 << i
        i += 1
      }
      fp
    }
  }

  /** SimHash-64 of a token array; null when no non-empty token. Bit i is
    * voted by bit (3 - (i & 3)) of hex-nibble (i >> 2) of each token's
    * md5 (see SimHash64Expr scaladoc — kept in lockstep with the DuckDB
    * oracle CTE in LlmOps.simhashSql). Called from generated code. */
  def simhash64(arr: ArrayData): java.lang.Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var any = false
    var j = 0
    while (j < n) {
      val tok = arr.getUTF8String(j)
      if (tok != null && tok.numBytes() > 0) {
        any = true
        val md = mdPool.get()
        md.reset()
        val digest = md.digest(tok.getBytes)
        var i = 0
        while (i < 64) {
          val nibIdx = i >> 2
          val b = digest(nibIdx >> 1)
          val nib = if ((nibIdx & 1) == 0) (b >> 4) & 0xf else b & 0xf
          if (((nib >> (3 - (i & 3))) & 1) != 0) counts(i) += 1 else counts(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    if (!any) null
    else {
      var fp = 0L
      var i = 0
      while (i < 64) {
        if (counts(i) > 0) fp |= 1L << i
        i += 1
      }
      java.lang.Long.valueOf(fp)
    }
  }
}
