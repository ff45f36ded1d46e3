package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{CosineSimilarityExpr, CosineTopClustersExpr, Int8MaxErrRatioExpr, IntArgminSqdistExpr, IntSqDistExpr, SimHash16Expr, SimHash64Expr}

/** Session extensions: the canonical injection point for the engine's
  * custom Catalyst surface. Installable two ways:
  *
  *   - programmatically: `GraftSession.builder(...)` applies it;
  *   - by config (works with plain spark-submit / spark-shell):
  *     `--conf spark.sql.extensions=graft.GraftExtensions`.
  *
  * Today this registers the codegen'd `cosine_similarity` function
  * session-wide (SQL and DataFrame API); future custom rules/strategies
  * (e.g. an as-of join planner rule) land here too.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (
        FunctionIdentifier("cosine_similarity"),
        new ExpressionInfo(
          classOf[CosineSimilarityExpr].getCanonicalName,
          null,
          "cosine_similarity",
          "cosine_similarity(a, b) - cosine similarity of two float arrays",
          ""
        ),
        exprs => CosineSimilarityExpr(exprs(0), exprs(1))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("int8_max_err_ratio"),
        new ExpressionInfo(
          classOf[Int8MaxErrRatioExpr].getCanonicalName,
          null,
          "int8_max_err_ratio",
          "int8_max_err_ratio(v) - max |x/s - round(x/s)| under absmax int8 quantization",
          ""
        ),
        exprs => Int8MaxErrRatioExpr(exprs(0))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("int_sqdist"),
        new ExpressionInfo(
          classOf[IntSqDistExpr].getCanonicalName,
          null,
          "int_sqdist",
          "int_sqdist(a, b) - exact integer squared distance of two bigint arrays",
          ""
        ),
        exprs => IntSqDistExpr(exprs(0), exprs(1))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("simhash16"),
        new ExpressionInfo(
          classOf[SimHash16Expr].getCanonicalName,
          null,
          "simhash16",
          "simhash16(tokens) - 16-bit SimHash fingerprint of an array<string> of tokens",
          ""
        ),
        exprs => SimHash16Expr(exprs(0))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("simhash64"),
        new ExpressionInfo(
          classOf[SimHash64Expr].getCanonicalName,
          null,
          "simhash64",
          "simhash64(tokens) - 64-bit SimHash fingerprint of an array<string> of tokens",
          ""
        ),
        exprs => SimHash64Expr(exprs(0))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("int_argmin_sqdist"),
        new ExpressionInfo(
          classOf[IntArgminSqdistExpr].getCanonicalName,
          null,
          "int_argmin_sqdist",
          "int_argmin_sqdist(x, centroids) - [argmin cluster, its int_sqdist] over the centroid matrix",
          ""
        ),
        exprs => IntArgminSqdistExpr(exprs(0), exprs(1))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("cosine_top_clusters"),
        new ExpressionInfo(
          classOf[CosineTopClustersExpr].getCanonicalName,
          null,
          "cosine_top_clusters",
          "cosine_top_clusters(e, centroids, topn) - topn cluster ids by descending cosine",
          ""
        ),
        exprs => CosineTopClustersExpr(exprs(0), exprs(1), exprs(2))
      )
    )
  }
}
