package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the canonicalization
  * step every near-dup dedup pipeline ends with: candidate PAIRS (MinHash
  * bands, SimHash buckets, embedding neighbors) become CLUSTERS, and each
  * cluster keeps one canonical document.
  *
  * Algorithm: Hash-Min label propagation. Every node starts labeled with
  * its own id; each iteration every node takes the min of its label and its
  * neighbors' labels; fixpoint = every node holds the min id reachable from
  * it, i.e. a deterministic component id. Each iteration is one equi-join +
  * one grouped min — all shuffles on node id, no driver data path; the
  * label frontier advances one hop per iteration, so iterations = component
  * diameter. Near-dup clusters are shallow (pairs share a bucket, so most
  * clusters are stars/cliques — diameter a handful), which makes Hash-Min
  * the right trade at 100 TB: alternating large-star/small-star (Kiveris et
  * al.) converges in O(log n) rounds but doubles the per-round shuffles,
  * only paying off on deep path-shaped graphs that dedup graphs aren't.
  *
  * Iteration state is localCheckpoint()ed: materialized eagerly and the
  * lineage CUT, otherwise the plan doubles every round and Catalyst
  * re-analysis dominates (the standard iterative-DataFrame trap). On a
  * cluster with flaky executors prefer reliable checkpoint(dir) — local
  * checkpoint blocks stay on executors.
  *
  * Semantics: nodes are the DISTINCT endpoints of `edges` (a document with
  * no near-dup pair is its own cluster trivially — callers join back if
  * they want singletons listed). Self-loops and duplicate/reversed edges
  * are tolerated. Throws if maxIter rounds don't reach the fixpoint rather
  * than returning silently-wrong labels.
  *
  * Reference semantic: the reference has no graph operator; this serves its
  * dedup workloads ("distill 572M Amazon reviews", reference
  * README.md:147-153) where duplicate-cluster canonicalization is the step
  * after pair generation.
  */
object ConnectedComponents {

  /** @return (id, comp): every distinct endpoint with its component id =
    *         min node id reachable from it. */
  def components(
      edges: DataFrame,
      src: String,
      dst: String,
      maxIter: Int = 25
  ): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val sym0 = edges.select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
    val und = sym0.union(sym0.select(col("v").as("u"), col("u").as("v"))).cache()
    var labels = und
      .select(col("u").as("id"))
      .distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    // The fixpoint test rides the SAME job that materializes the next
    // labels (an accumulator counting label decreases inside the map),
    // instead of a separate compare-join job per round — halves the jobs
    // in the loop. Task retries can only over-count (at-least-once), so a
    // spurious non-zero costs one extra round but can never terminate the
    // loop early with wrong labels.
    val changed = spark.sparkContext.longAccumulator("cc-changed")
    var converged = false
    var iter = 0
    // finally, not fall-through: a task failure mid-iteration (executor
    // losing a localCheckpoint block is the documented risk) must not
    // leak the doubled edge list in the cache for the session lifetime
    try {
      while (!converged && iter < maxIter) {
        val nbrMin = und
          .join(labels.select(col("id").as("v"), col("comp").as("vcomp")), "v")
          .groupBy(col("u").as("id"))
          .agg(min("vcomp").as("nbr"))
        changed.reset()
        val next = labels
          .join(nbrMin, "id")
          .select(col("id"), col("comp"), col("nbr"))
          .as[(Long, Long, Long)]
          .map { case (id, comp, nbr) =>
            val nc = math.min(comp, nbr)
            if (nc < comp) changed.add(1L)
            (id, nc)
          }
          .toDF("id", "comp")
          .localCheckpoint() // materializes eagerly => accumulator is final
        labels = next
        converged = changed.value == 0L
        iter += 1
      }
    } finally und.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter iterations " +
          "(component diameter exceeds maxIter — raise it, or use " +
          "star-contraction for pathological path-shaped graphs)"
      )
    labels
  }
}
