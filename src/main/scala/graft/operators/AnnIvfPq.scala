package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fused IVF-PQ search — the production vector-store shape (FAISS
  * IndexIVFPQ): the IVF coarse quantizer prunes the search to each
  * query's `nprobe` probed lists, PQ ADC scores ONLY those candidates
  * from the compressed codes, and the exact fixed-point kernel re-ranks
  * the ADC shortlist. The two stages exist separately as [[AnnIvf]]
  * (e06: probe + exact rescore of every candidate) and [[AnnPq]] (e12:
  * ADC over the whole corpus); fused, the exact work drops to the
  * shortlist and the ADC work to the probed fraction — at 100 TB that is
  * the difference between touching `nprobe/nlist` of the codes (bytes,
  * not vectors) and touching everything.
  *
  * Composition, not reimplementation: probe lists come from the SAME
  * compiled cosine-top-clusters kernel the IVF assignment uses (applied
  * to the queries frame — identical tie-breaks by construction), the
  * candidate set is one broadcast equi-join on cluster id, and the ADC +
  * re-rank is [[AnnPq.topKCandidates]] with the candidate pairs plugged
  * into its fusion seam. The auto-shortlist rule therefore sizes itself
  * from the PROBED candidates per query, preserving AnnPq's
  * searched-corpus discipline under pruning. */
object AnnIvfPq {

  /** One-shot fused search: fit both quantizers in-plan, then search.
    * `queries` must be small (the AnnIvf/AnnLsh/AnnPq contract — its
    * vectors become broadcasts). Output: (qid, rnk, vid, d2), d2 the
    * exact fixed-point squared L2 of the re-rank, like AnnPq.topK. */
  def topK(
      spark: SparkSession,
      emb: DataFrame, // vec_id, embedding
      queries: DataFrame, // vec_id, embedding (small by construction)
      k: Int = 5,
      nlist: Int = 16,
      nprobe: Int = 4,
      subspaces: Int = 4,
      subDim: Int = 16,
      pqK: Int = 16,
      pqIters: Int = 1,
      shortlist: Int = 0
  ): DataFrame = {
    // one corpus cache spans both quantizer fits + the search (the
    // AnnIvf.topK discipline); the result is queries × k rows, so it is
    // materialized eagerly and the cache released before returning
    val cached = emb.cache()
    try {
      val cs = AnnIvf.fit(spark, cached, nlist)
      val pq = AnnPq.fit(spark, cached, subspaces, subDim, pqK, pqIters)
      topKWith(spark, cached, queries, cs, pq, k, nprobe, shortlist)
        .localCheckpoint()
    } finally cached.unpersist()
  }

  /** Search against already-fitted quantizers — the artifact path
    * (loadCentroids + AnnPq.load feed this at production scale). */
  def topKWith(
      spark: SparkSession,
      emb: DataFrame,
      queries: DataFrame,
      centroids: Seq[Array[Double]],
      pq: AnnPq.Model,
      k: Int,
      nprobe: Int,
      shortlist: Int = 0
  ): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    // per-query probe lists THROUGH the compiled kernel the corpus
    // assignment uses — identical metric and tie-breaks, no driver-side
    // reimplementation to drift; queries × nprobe rows, broadcastable
    val probes = queries.select(
      col("vec_id").as("qid"),
      explode(AnnIvf.topClustersCol(centroids, nprobe)).as("cluster"))
    val assigned = emb
      .select(col("vec_id"), col("embedding"))
      .withColumn("cluster", AnnIvf.nearestCentroidCol(centroids))
      .select("vec_id", "cluster")
    // candidate pairs: each corpus row fans out only to the queries
    // probing its list — bounded by |queries|, ~nprobe/nlist of the
    // corpus per query
    val cand = assigned
      .join(broadcast(probes), "cluster")
      .select(col("qid"), col("vec_id").as("vid"))
    AnnPq.topKCandidates(spark, emb, queries, pq, k, shortlist, Some(cand))
  }
}
