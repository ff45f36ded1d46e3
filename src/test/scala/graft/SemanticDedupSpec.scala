package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.LlmOps

/** d10 scale guards: corpus-derived k and the hot-cluster triangle
  * fallback. The adversarial shape is an all-duplicate corpus — k-means
  * collapses it into ONE cluster no matter how k was sized, and a naive
  * within-cluster self-join would put the whole quadratic compare on a
  * single reducer. */
class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("kForCorpus: k scales with the corpus; oracle-tier coupling pinned") {
    assert(LlmOps.kForCorpus(500, LlmOps.semTargetClusterSize) == 8)
    assert(LlmOps.kForCorpus(0, 64) == 1)
    assert(LlmOps.kForCorpus(1, 64) == 1)
    assert(LlmOps.kForCorpus(64, 64) == 1)
    assert(LlmOps.kForCorpus(65, 64) == 2)
    // linear in n: 100x the corpus -> 100x the clusters, not 100x the
    // within-cluster pair cost
    assert(LlmOps.kForCorpus(5000, 64) == 79)
    assert(LlmOps.kForCorpus(500000, 64) == 7813)
  }

  test("kForCorpusSql mirrors kForCorpus for any corpus size (r13)") {
    // r13: the d10 oracle previously hardcoded k = 8, valid only on
    // 500-vec tiers — the first full sf0.1 sweep (2000 vecs, engine
    // k = 32) caught the divergence. The oracle now derives k in SQL;
    // this pins the two derivations to the same function: the SQL is
    // GREATEST(1, CEIL(n / target)) and must equal kForCorpus everywhere
    // (including the empty-corpus floor), and it must carry the same
    // target constant the Scala side uses.
    val t = LlmOps.semTargetClusterSize
    for (n <- Seq(0L, 1L, 63L, 64L, 65L, 128L, 500L, 2000L, 5000L, 500000L)) {
      val sqlK = math.max(1L, math.ceil(n.toDouble / t).toLong)
      assert(sqlK == LlmOps.kForCorpus(n, t), s"n=$n")
    }
    assert(LlmOps.kForCorpusSql.contains(s"/ $t.0"),
      "the SQL derivation must use semTargetClusterSize")
    assert(LlmOps.kForCorpusSql.contains("AS BIGINT"),
      "k must stay integer in SQL — a double k breaks the dist*k+c packing")
  }

  test("adversarial one-cluster corpus routes hot path; pairs complete and exact") {
    import spark.implicits._
    val n = 120
    // all-identical embeddings: every row lands in cluster 0 regardless
    // of k (zero distance everywhere; packed-encoding ties break to the
    // smallest cluster id)
    val emb = (0 until n)
      .map(i => (i.toLong, Array(1.0f, 2.0f, 3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    // target 8 / hotFactor 2: hot threshold 16 << 120, so the single
    // cluster MUST take the triangle path
    val got = LlmOps
      .semanticDedupPairs(spark, emb, targetClusterSize = 8, hotFactor = 2, nBlocks = 4)
      .select("va", "vb")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    val want = (for { i <- 0 until n; j <- i + 1 until n } yield (i.toLong, j.toLong)).toSeq
    // every identical pair has cosine exactly 1 >= 0.35: complete coverage,
    // exactly once (multiset compare catches triangle double-emission)
    assert(got.sorted == want.sorted, s"${got.size} pairs vs ${want.size} expected")
  }

  test("hot and cold routing produce identical pairs (only distribution differs)") {
    import spark.implicits._
    // two distinguishable groups + per-row jitter so clusters are nontrivial
    val emb = (0 until 90).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0.0f, 0.5f) else Array(0.0f, 1.0f, -0.5f)
      (i.toLong, base.zipWithIndex.map { case (v, d) => v + 0.001f * ((i + d) % 7) })
    }.toDF("vec_id", "embedding")
    def run(hotFactor: Int) = LlmOps
      .semanticDedupPairs(spark, emb, targetClusterSize = 8, hotFactor = hotFactor, nBlocks = 4)
      .select("cluster", "va", "vb", "cosine")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val allCold = run(hotFactor = 1000000)
    val allHot = run(hotFactor = 0) // threshold 0: every cluster is "hot"
    assert(allCold == allHot, "routing changed the result set")
    assert(allCold.nonEmpty, "degenerate test: no pairs at all")
  }

  test("cluster-keyed triangle join: exactly-once pairs, per-reducer work bounded") {
    import spark.implicits._
    val n = 100
    val nBlocks = 4
    val df = (0 until n)
      .map(i => (0, i.toLong, s"p$i"))
      .toDF("cluster", "vec_id", "payload")
    val pairs = LlmOps
      .triangleSelfJoin(spark, df, "vec_id", Seq("payload"), nBlocks, keys = Seq("cluster"))
      .select(col("x.vec_id"), col("y.vec_id"))
      .collect()
      .map { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        (math.min(a, b), math.max(a, b))
      }
      .toSeq
    val want = (for { i <- 0 until n; j <- i + 1 until n } yield (i.toLong, j.toLong)).toSeq
    assert(pairs.sorted == want.sorted, "keyed triangle lost/duplicated pairs")
    // the fan-out bound: rows hash into nBlocks blocks, so the largest
    // join group is maxBlock^2 comparisons, not n^2 on one reducer
    val blockSizes = (0 until n)
      .map(i => i.toLong)
      .toDF("vec_id")
      .select(pmod(xxhash64(col("vec_id")), lit(nBlocks.toLong)).cast("int").as("b"))
      .groupBy("b")
      .count()
      .collect()
      .map(_.getLong(1))
    assert(blockSizes.length == nBlocks, "some block is empty — blocking degenerate")
    assert(blockSizes.max < n * 3 / 4,
      s"blocking failed to spread rows: max block ${blockSizes.max} of $n")
  }
}
