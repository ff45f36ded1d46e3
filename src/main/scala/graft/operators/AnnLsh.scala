package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Approximate nearest-neighbor search via random-hyperplane LSH —
  * the sub-linear scale path next to the brute-force baseline
  * (LlmOps.e01). Multi-table signed-projection LSH:
  *
  *   - `tables` independent hash tables, each hashing a vector to a
  *     `bitsPerTable`-bit bucket (sign of the dot product against fixed
  *     random hyperplanes, seeded deterministically);
  *   - candidates = vectors sharing any table's bucket with the query;
  *   - exact top-k rescoring (compiled cosine kernel) over candidates only.
  *
  * At 100 TB: buckets are an equi-join key, so candidate generation is a
  * plain hash join (shuffle on ~1/2^bits of the corpus per table) instead
  * of the brute-force full scan per query — and the plane matrix is a few
  * KB broadcast to every executor.
  */
object AnnLsh {

  /** One seed for BOTH sides of the candidate equi-join: corpus bucketing
    * (buckets' default) and query probing (topK -> probeBuckets) must
    * draw the SAME hyperplanes or sign decisions diverge and the join
    * matches essentially random buckets — recall collapses with no loud
    * failure (only the e05 gate would catch it downstream). */
  private[graft] val DefaultSeed = 42L

  /** Deterministic plane matrix: tables x bitsPerTable planes of `dim`. */
  private def planes(dim: Int, tables: Int, bitsPerTable: Int, seed: Long): Array[Array[Array[Float]]] = {
    val rnd = new Random(seed)
    Array.fill(tables, bitsPerTable)(Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
  }

  /** (vec_id, table, bucket) long-form bucket assignment. */
  def buckets(
      spark: SparkSession,
      emb: DataFrame, // vec_id, embedding: array<float>
      dim: Int,
      tables: Int = 8,
      bitsPerTable: Int = 4,
      seed: Long = DefaultSeed
  ): DataFrame = {
    VectorFunctions.register(spark)
    val ps = planes(dim, tables, bitsPerTable, seed)
    val tableCols: Seq[Column] = (0 until tables).map { t =>
      val bucket: Column = (0 until bitsPerTable)
        .map { b =>
          // sign of the dot = sign of the cosine; the compiled kernel
          // keeps this a single tight loop per (row, plane).
          when(planeCosine(ps(t)(b)) > 0, lit(1 << b))
            .otherwise(lit(0))
        }
        .reduce(_ + _)
      struct(lit(t).as("t"), bucket.as("bucket"))
    }
    // ids + bucket keys ONLY — no embedding column: the bucket table is
    // the persistable index artifact, and carrying the raw vectors
    // through the explode would store/shuffle tables x corpus copies of
    // them (8x the embedding volume at the default tables=8) for any
    // consumer that materializes this frame. Rescoring re-attaches
    // embeddings by joining the corpus on vec_id (see topK).
    emb
      .select(col("vec_id"), explode(array(tableCols: _*)).as("tb"))
      .select(col("vec_id"), col("tb.t"), col("tb.bucket"))
  }

  /** One plane's cosine as a kernel call with the plane as a SINGLE
    * array literal. The old spelling rendered every component as a
    * `CAST(<v> AS FLOAT)` SQL fragment and re-PARSED it through expr():
    * 64-element planes x 32 (table, bit) pairs put ~2k cast nodes per
    * query through the parser and analyzer — measured as ~2s of
    * driver-side time on e04 against 1.1s of actual stage work. typedLit
    * builds the identical float values (Float.toString round-trips) as
    * one Literal node each, no parser involved. */
  private def planeCosine(p: Array[Float]): Column =
    call_function("cosine_similarity", col("embedding"), typedLit[Seq[Float]](p.toSeq))

  /** Multi-probe bucket assignment for the QUERY side: per (row, table),
    * `nprobe` bucket values — the row's own bucket first, then the
    * buckets reached by flipping ONE sign bit each, in ascending order of
    * the flipped hyperplane's |projection| (the classic multi-probe LSH
    * probe sequence: the most marginal sign decisions are the likeliest
    * to separate true neighbors, so flip those first). Recall rises the
    * way adding hash tables would, WITHOUT re-bucketing the corpus — the
    * corpus side stays one row per (doc, table); only the broadcast-sized
    * query side fans out nprobe×. Bucket bits and probe margins are
    * computed IN-PLAN from the same compiled projections as [[buckets]],
    * so query- and corpus-side sign decisions can never disagree. */
  private def probeBuckets(
      queries: DataFrame,
      dim: Int,
      tables: Int,
      bitsPerTable: Int,
      seed: Long,
      nprobe: Int
  ): DataFrame = {
    VectorFunctions.register(queries.sparkSession)
    require(
      nprobe >= 1 && nprobe - 1 <= bitsPerTable,
      s"nprobe=$nprobe out of range: single-bit multi-probe yields at most " +
        s"bitsPerTable + 1 = ${bitsPerTable + 1} distinct buckets per table " +
        "(raise bitsPerTable or tables instead of probing further)"
    )
    val ps = planes(dim, tables, bitsPerTable, seed)
    val nFlips = nprobe - 1
    val tableCols: Seq[Column] = (0 until tables).map { t =>
      val dots = (0 until bitsPerTable).map { b => planeCosine(ps(t)(b)) }
      val bucket: Column = dots.zipWithIndex
        .map { case (d, b) => when(d > 0, lit(1 << b)).otherwise(lit(0)) }
        .reduce(_ + _)
      // (|margin|, bit) ascending: array_sort on structs orders by the
      // margin, ties to the lower bit — deterministic probe sequence
      val flips = array_sort(
        array(dots.zipWithIndex.map { case (d, b) =>
          struct(abs(d).as("m"), lit(b).as("b"))
        }: _*)
      )
      val probes = bucket +: (0 until nFlips).map { i =>
        bucket.bitwiseXOR(
          call_function("shiftleft", lit(1), element_at(flips, i + 1).getField("b"))
        )
      }
      struct(lit(t).as("t"), array(probes: _*).as("probes"))
    }
    queries
      .select(col("vec_id"), explode(array(tableCols: _*)).as("tb"))
      .select(col("vec_id"), col("tb.t").as("t"), explode(col("tb.probes")).as("bucket"))
  }

  /** Top-k approximate neighbors for each query vector. `nprobe` > 1
    * turns on multi-probe (see probeBuckets) — recall climbs toward the
    * brute-force baseline at the cost of probing nprobe buckets per
    * (query, table) instead of one; candidate generation stays an
    * equi-join and the corpus is never re-bucketed. */
  def topK(
      spark: SparkSession,
      emb: DataFrame, // vec_id, embedding
      queries: DataFrame, // vec_id, embedding (subset)
      dim: Int,
      k: Int = 5,
      tables: Int = 8,
      bitsPerTable: Int = 4,
      nprobe: Int = 1
  ): DataFrame = {
    val corpusBuckets = buckets(spark, emb, dim, tables, bitsPerTable)
    val queryBuckets = probeBuckets(queries, dim, tables, bitsPerTable, DefaultSeed, nprobe)
      .withColumnRenamed("vec_id", "qid")
    // Dedup multi-table candidate hits on bare (qid, vec_id) ids — the
    // distinct's shuffle then moves two longs per row instead of two full
    // embedding arrays; embeddings are re-attached afterwards (corpus via
    // equi-join on vec_id, queries via broadcast — the query set is small
    // by construction).
    val candidateIds = corpusBuckets
      .select("vec_id", "t", "bucket")
      .join(broadcast(queryBuckets.select("qid", "t", "bucket")), Seq("t", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select("qid", "vec_id")
      .distinct()
    val scored = candidateIds
      .join(emb, "vec_id")
      .join(
        broadcast(queries.select(col("vec_id").as("qid"), col("embedding").as("q_embedding"))),
        "qid"
      )
      .withColumn("cosine", expr("cosine_similarity(q_embedding, embedding)"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id").as("vid"), col("cosine"))
      .orderBy("qid", "rnk")
  }
}
