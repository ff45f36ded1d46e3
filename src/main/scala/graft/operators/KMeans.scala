package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Distributed Lloyd k-means over an embedding corpus, in EXACT
  * fixed-point integer arithmetic — the clustering primitive of a
  * training-data pipeline (semantic dedup blocks, data-mixing strata,
  * IVF index training), built so that every assignment, centroid, and
  * SSE is bit-identical on any cluster size AND reproducible by an
  * independent engine (the DuckDB oracle of query e09).
  *
  * Number representation: each float32 component is widened to a
  * fixed-point long at scale 7 (`x * 10^7`, exact for this data per the
  * scale-6 decimal parity rule + one guard digit of centroid
  * resolution). Distances are exact long sums of squared diffs
  * (functions.IntSqDistExpr, compiled); centroids are truncated integer
  * means (`S / n` in Java semantics — toward zero), so a centroid is
  * within 1e-7 of the true mean, far below any clustering-relevant
  * signal, and the whole fit is integer-deterministic: no float
  * accumulation order anywhere.
  *
  * Scale shape (the 100 TB posture):
  *   - the corpus is touched once per iteration with a COMPILED per-row
  *     argmin (one int_argmin_sqdist kernel call carrying the whole
  *     centroid matrix as a single literal — no join, no shuffle for
  *     assignment, generated-code size constant in k);
  *   - the update step is one posexplode + grouped long sum per
  *     iteration (map-side combinable, k x dims result rows);
  *   - centroids live on the driver between iterations — k x dims longs
  *     of METADATA, independent of corpus size (the same move as
  *     AnnIvf/AnnLsh's literal centroid/plane matrices);
  *   - seeds are the k smallest md5(vec_id) rows: deterministic,
  *     engine-independent, and a TakeOrdered (partial top-k), not a
  *     global sort.
  *
  * Assignment ties break toward the smaller cluster id (the kernel's
  * ascending strict-< scan — the same winner the earlier packed
  * `dist * k + cluster` encoding produced); the kernel returns
  * [cluster, dist] directly, so no arithmetic ever multiplies a
  * distance by k and the overflow bound is k-independent.
  */
object KMeans {

  // Fixed-point scale: float32 -> long at 10^7, via an explicit DOUBLE
  // intermediate — DuckDB casts FLOAT->DECIMAL in float arithmetic, which
  // misrounds near half-boundaries (measured: dozens of off-by-one-ulp
  // divergences at sf0.01); FLOAT->DOUBLE is exact in both engines and
  // DOUBLE->DECIMAL(18,7) verified deviant-free on the embeddings data.

  final case class Model(k: Int, centroids: IndexedSeq[Array[Long]]) {
    /** Sum of |centroid component|s per cluster — the metadata checksum
      * e09 emits so the oracle pins the centroids themselves, not just
      * the memberships. */
    def l1(c: Int): Long = centroids(c).map(math.abs).sum
  }

  /** (vec_id, x: array<bigint>) — the corpus in fixed-point. Cached by
    * fit(); at 100 TB this is the materialize-once quantized corpus. */
  private[graft] def fixedPoint(emb: DataFrame, embCol: String): DataFrame =
    emb.select(
      col("vec_id"),
      expr(s"transform($embCol, v -> CAST(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,7)) * 10000000 AS BIGINT))")
        .as("x")
    )

  /** Driver-side scalar twin of fixedPoint's per-element transform —
    * anything that mixes driver-computed values into the fixed-point
    * space (e12's ADC lookup tables vs model.centroids) MUST go through
    * this so the scale constant and rounding mode have exactly one copy.
    * BigDecimal(double) uses the shortest decimal representation and
    * setScale(7, HALF_UP) matches CAST(double AS DECIMAL(18,7)). */
  private[graft] def fixedPointLong(v: Float): Long =
    (BigDecimal(v.toDouble).setScale(7, BigDecimal.RoundingMode.HALF_UP)
      * 10000000L).toLongExact

  /** [cluster, dist] per row, as ONE compiled kernel call with the whole
    * centroid matrix as a single nested-array literal
    * (IntArgminSqdistExpr). The per-centroid inlined-expression form blew
    * the JVM 64 KB method / constant-pool limits past a few hundred
    * clusters (k x dims literals in the generated source); the kernel's
    * generated code is constant-size in k. Semantics are bit-identical
    * to the per-centroid int_sqdist formulation (ties to smallest c). */
  private[graft] def assignPairCol(model: Model): Column =
    call_function(
      "int_argmin_sqdist",
      col("x"),
      typedLit[Seq[Seq[Long]]](model.centroids.map(_.toSeq).toSeq)
    )

  /** Fit `k` clusters with `iters` Lloyd updates from deterministic
    * md5-ordered seeds. Returns the model; `assign` labels a corpus.
    *
    * A corpus with fewer than `k` rows yields fewer seeds: the model is
    * silently clamped to `Model(n, ...)` rather than padding with
    * degenerate duplicate centroids.
    *
    * Exact-arithmetic guard: int_sqdist's long accumulation is overflow-
    * free while |component| < sqrt(Long.MaxValue / dims) / 2 (the /2
    * covers the worst-case component difference; the bound is
    * k-INDEPENDENT now that the kernel returns [cluster, dist] instead
    * of the old dist*k+c packing, whose *k factor capped corpus-derived
    * k at ~360 for unit-scale 64-dim embeddings). fit() asserts the
    * corpus max |component| against the bound ONCE (a map-side-
    * combinable max over the cached fixed-point corpus) — a silent long
    * wrap would otherwise mis-assign clusters with no error on the
    * Spark side, caught only by the oracle. */
  def fit(
      spark: SparkSession,
      emb: DataFrame, // vec_id, <embCol>: array<float>
      k: Int,
      iters: Int,
      embCol: String = "embedding"
  ): Model = {
    VectorFunctions.register(spark)
    require(k > 0 && iters >= 0, "k must be positive and iters non-negative")
    // cache scope = this fit() call (seeds + bound check + iters passes);
    // released in the finally — AnnPq.fit calls this once per subspace,
    // and un-released corpus caches would pin subspaces x corpus in
    // executor storage for the session lifetime. Callers that label the
    // SAME corpus right after fitting should use fitAssign, which shares
    // this cache scope instead of recomputing the transform.
    val fp = fixedPoint(emb, embCol).cache()
    try fitOnCached(fp, k, iters)
    finally fp.unpersist()
  }

  /** fit + the fitted corpus's own labeling in ONE cache scope: the
    * fixed-point corpus is cached once, feeds the fit passes AND the
    * final assignment, and is released before returning — the assignment
    * is eagerly materialized (localCheckpoint) as metadata-light
    * (vec_id, cluster, dist) rows, auto-freed when the frame is dropped.
    * This is the shape d10/e09 run: fit-then-label-the-training-corpus;
    * fit followed by assign() would recompute the corpus transform after
    * the fit cache is gone. */
  def fitAssign(
      spark: SparkSession,
      emb: DataFrame,
      k: Int,
      iters: Int,
      embCol: String = "embedding"
  ): (Model, DataFrame) = {
    VectorFunctions.register(spark)
    require(k > 0 && iters >= 0, "k must be positive and iters non-negative")
    val fp = fixedPoint(emb, embCol).cache()
    try {
      val model = fitOnCached(fp, k, iters)
      (model, assignFromFp(fp, model).localCheckpoint(true))
    } finally fp.unpersist()
  }

  private def fitOnCached(fp: DataFrame, k: Int, iters: Int): Model = {
    val seeds = fp
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(k)
      .select("x")
      .collect()
      .map(_.getSeq[Long](0).toArray)
      .toIndexedSeq
    require(seeds.nonEmpty, "cannot fit k-means on an empty corpus")
    val dims = math.max(seeds.head.length, 1)
    val bound = math.sqrt(Long.MaxValue.toDouble / dims.toDouble) / 2
    def checkBound(maxAbs: Long): Unit = require(
      maxAbs.toDouble <= bound,
      s"fixed-point components reach |$maxAbs|, past the exact-arithmetic " +
        s"bound $bound for dims=$dims: squared distances would wrap"
    )
    // iters == 0 ships the seeds as the model but downstream assignment
    // still squares distances — the bound check needs its own pass only
    // on this degenerate path; the iterating path folds it into the
    // first Lloyd aggregation below (one full corpus pass saved per fit,
    // and this operator is fitted ~15x across the suite: e10/e13 run 4
    // subspace fits each). A wrap is still surfaced BEFORE any result
    // leaves fit(): the first pass's sums are discarded by the throw.
    if (iters == 0)
      checkBound(
        fp.select(max(expr("aggregate(x, 0L, (m, v) -> greatest(m, abs(v)))")).as("m"))
          .head()
          .getLong(0))
    var model = Model(seeds.length, seeds)
    for (it <- 0 until iters) {
      // one corpus pass: compiled assignment, then per-(cluster, dim)
      // exact long sums — k x dims rows back to the driver (metadata).
      // The first pass also carries the per-(cluster, dim) max |component|
      // (its global max IS the corpus max — grouping cannot lose a row),
      // so the overflow gate costs no extra pass.
      val rows = fp
        .withColumn("c", element_at(assignPairCol(model), 1).cast("int"))
        .select(col("c"), posexplode(col("x")))
        .groupBy("c", "pos")
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"),
          max(abs(col("col"))).as("ma"))
        .collect()
      if (it == 0) checkBound(rows.map(_.getLong(4)).foldLeft(0L)(math.max))
      val sums = rows
        .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      val next = model.centroids.zipWithIndex.map { case (old, c) =>
        // a cluster that lost all members keeps its previous centroid
        if (!sums.contains((c, 0))) old
        else
          old.indices.map { d =>
            val (s, n) = sums((c, d))
            s / n // Java long division truncates toward zero — the
            // documented centroid semantic, mirrored in the oracle SQL
          }.toArray
      }
      model = Model(model.k, next)
    }
    model
  }

  /** Persist a fitted model as a parquet artifact: one row per cluster,
    * `(cluster INT, centroid ARRAY<BIGINT>)`. Fixed-point longs round-trip
    * parquet bit-exactly, so `load(save(m)) == m` and every downstream
    * assignment (d10's blocks, e09's labels, AnnPq's codes) is
    * byte-identical from the loaded artifact — the build-once/reuse shape
    * the 100 TB pipeline runs (fit on one scheduled job, assign from the
    * artifact on every ingest). Metadata-sized: k rows, one file. */
  def save(spark: SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    model.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("cluster", "centroid")
      .repartition(1)
      .write
      .mode("overwrite")
      .parquet(path)
    // manifest LAST — it is the artifact's commit marker (see ArtifactManifest)
    ArtifactManifest.write(
      spark,
      path,
      "kmeans",
      Map("k" -> model.k.toString, "dim" -> model.centroids.head.length.toString)
    )
  }

  /** Reload a model written by [[save]] (exact inverse — see save). The
    * manifest is verified first: kind/version, then the declared k and
    * centroid dimensionality against what the table actually holds —
    * a truncated, foreign, or hand-mutated artifact raises a typed
    * [[ArtifactManifest.Mismatch]]/[[ArtifactManifest.Missing]] instead
    * of silently mislabeling a corpus. */
  def load(spark: SparkSession, path: String): Model = {
    val mf = ArtifactManifest.readAndCheck(spark, path, "kmeans")
    val cents = spark.read
      .parquet(path)
      .select("cluster", "centroid")
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1).toArray)
      .sortBy(_._1)
      .map(_._2)
      .toIndexedSeq
    require(cents.nonEmpty, s"no k-means centroids found at $path")
    ArtifactManifest.check(path, "k", mf.getOrElse("k", "?"), cents.length.toString)
    ArtifactManifest.check(path, "dim", mf.getOrElse("dim", "?"), cents.head.length.toString)
    Model(cents.length, cents)
  }

  /** Corpus with `cluster` and exact integer `dist` columns (fixed-point
    * squared distance to the assigned centroid). */
  def assign(spark: SparkSession, emb: DataFrame, model: Model, embCol: String = "embedding"): DataFrame = {
    VectorFunctions.register(spark)
    assignFromFp(fixedPoint(emb, embCol), model)
  }

  private def assignFromFp(fp: DataFrame, model: Model): DataFrame =
    fp
      .withColumn("asn", assignPairCol(model))
      .select(
        col("vec_id"),
        element_at(col("asn"), 1).cast("int").as("cluster"),
        element_at(col("asn"), 2).as("dist")
      )
}
