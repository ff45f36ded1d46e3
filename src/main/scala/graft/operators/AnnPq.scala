package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Product-quantization ANN: the two-stage search over PQ code words —
  * the third scale path beside LSH (AnnLsh) and IVF (AnnIvf), trading
  * the most storage for the cheapest corpus scan (subspaces bytes/vector
  * instead of the raw floats).
  *
  * Index build (one corpus pass per subspace): the embedding splits into
  * `subspaces` contiguous sub-vectors; each subspace gets an independent
  * integer-exact k-means codebook (operators.KMeans — deterministic
  * md5-ordered seeds, fixed-point longs) and every vector is assigned
  * its nearest centroid id per subspace: a `subspaces`-byte code word.
  * At production scale codes + codebooks are the persisted artifact; the
  * raw vectors are only needed for the re-rank stage.
  *
  * Query (the classic ADC + re-rank plan):
  *   1. SHORTLIST — per query, the exact integer sqdist from each query
  *      sub-vector to every subspace centroid forms a lookup table
  *      (metadata: n_queries x subspaces x k longs, computed driver-side
  *      with KMeans.fixedPointLong so it lives in the SAME fixed-point
  *      space as the codebooks). A code word's ADC score is the sum of
  *      its `subspaces` table entries — the corpus-side scan touches
  *      ONLY codes, via an equi-join on (subspace, code) against the
  *      broadcast tables. Top-`shortlist` per query survive.
  *   2. RE-RANK — compiled int_sqdist on the shortlist's raw vectors
  *      (~shortlist rows per query, not the corpus) picks the final
  *      top-k. Raw 4x16 ADC alone measures ~0.1 recall at the oracle
  *      tier vs 0.58 with re-rank — the reason production PQ always
  *      re-ranks; e12 gates this pairing against exact integer-L2.
  */
object AnnPq {

  /** `corpusRows` records the fit-time corpus size in the model and its
    * manifest — provenance metadata (how much data trained this
    * codebook), NOT a sizing input: [[topK]]'s auto shortlist derives
    * from the corpus actually searched (r12 — a fit-time budget goes
    * stale the moment ingestion grows the corpus past the training
    * snapshot). -1 = unknown (a pre-round-11 artifact). */
  final case class Model(
      subspaces: Int,
      subDim: Int,
      codebooks: IndexedSeq[KMeans.Model],
      corpusRows: Long = -1L
  )

  /** Fit one codebook per subspace over the corpus (deterministic). */
  def fit(
      spark: SparkSession,
      emb: DataFrame, // vec_id, embedding: array<float>
      subspaces: Int,
      subDim: Int,
      k: Int,
      iters: Int = 1
  ): Model = {
    val books = (0 until subspaces).map { m =>
      KMeans.fit(spark, subVectors(emb, m, subDim), k = k, iters = iters)
    }
    Model(subspaces, subDim, books, emb.count())
  }

  /** Persist the codebook set as one parquet artifact: a row per
    * (subspace, cluster) with its fixed-point centroid and the constant
    * subspace width. PQ is THE index whose build/search split matters at
    * scale — codebooks are trained on a sample once, then every ingest
    * encodes against the frozen artifact (re-fitting would silently
    * re-code the corpus differently); integer centroids make the
    * round-trip bit-exact, so codes from a loaded model are byte-identical
    * to codes from the fitted one (spec-pinned, e13-gated). */
  def save(spark: SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    (for {
      m <- 0 until model.subspaces
      c <- 0 until model.codebooks(m).k
    } yield (m, c, model.codebooks(m).centroids(c).toSeq, model.subDim))
      .toDF("subspace", "cluster", "centroid", "sub_dim")
      .repartition(1)
      .write
      .mode("overwrite")
      .parquet(path)
    // manifest LAST — it is the artifact's commit marker (see ArtifactManifest)
    ArtifactManifest.write(
      spark,
      path,
      "pq-codebooks",
      Map(
        "subspaces" -> model.subspaces.toString,
        "sub_dim" -> model.subDim.toString,
        "k" -> model.codebooks.head.k.toString,
        "corpus_rows" -> model.corpusRows.toString
      )
    )
  }

  /** Reload a codebook artifact written by [[save]] (exact inverse).
    * Manifest-validated: kind/version, then subspace count, subspace
    * width, and per-book k against the loaded rows — a foreign or
    * truncated codebook raises a typed error instead of re-coding the
    * corpus differently in silence. */
  def load(spark: SparkSession, path: String): Model = {
    val mf = ArtifactManifest.readAndCheck(spark, path, "pq-codebooks")
    val rows = spark.read
      .parquet(path)
      .select("subspace", "cluster", "centroid", "sub_dim")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2).toArray, r.getInt(3)))
    require(rows.nonEmpty, s"no PQ codebooks found at $path")
    val subDim = rows.head._4
    val books = rows
      .groupBy(_._1)
      .toIndexedSeq
      .sortBy(_._1)
      .map { case (_, rs) =>
        val cents = rs.sortBy(_._2).map(_._3).toIndexedSeq
        KMeans.Model(cents.length, cents)
      }
    ArtifactManifest.check(path, "subspaces", mf.getOrElse("subspaces", "?"), books.length.toString)
    ArtifactManifest.check(path, "sub_dim", mf.getOrElse("sub_dim", "?"), subDim.toString)
    ArtifactManifest.check(path, "k", mf.getOrElse("k", "?"), books.head.k.toString)
    // absent on pre-corpus_rows artifacts → -1 (topK's counted fallback)
    Model(books.length, subDim, books, mf.getOrElse("corpus_rows", "-1").toLong)
  }

  private def subVectors(emb: DataFrame, m: Int, subDim: Int): DataFrame =
    emb.select(
      col("vec_id"),
      slice(col("embedding"), m * subDim + 1, subDim).as("embedding")
    )

  /** (vec_id, code0..code{subspaces-1}, pq_dist): every vector's code
    * word plus its exact fixed-point reconstruction distortion. */
  def codes(spark: SparkSession, emb: DataFrame, model: Model): DataFrame =
    (0 until model.subspaces)
      .map { m =>
        KMeans
          .assign(spark, subVectors(emb, m, model.subDim), model.codebooks(m))
          .select(col("vec_id"), col("cluster").as(s"code$m"), col("dist").as(s"__d$m"))
      }
      .reduce(_.join(_, "vec_id"))
      .select(
        col("vec_id") +:
          (0 until model.subspaces).map(m => col(s"code$m")) :+
          (0 until model.subspaces).map(m => col(s"__d$m")).reduce(_ + _).as("pq_dist"): _*
      )

  /** Top-k approximate neighbors by ADC shortlist + exact re-rank.
    * `queries` must be small (its vectors become driver-side lookup
    * tables and broadcasts — same contract as AnnIvf/AnnLsh). Output:
    * (qid, rnk, vid, d2) with d2 the exact fixed-point squared L2.
    *
    * `shortlist = 0` (the default) resolves PER QUERY to
    * max(100, searched_corpus/10) CAPPED AT 1000: a FIXED shortlist is a
    * silent recall cliff — the ADC stage's discrimination is constant
    * (subspaces × k cells) while the corpus grows, so the true
    * neighbors' ADC ranks drift down and a constant cut drops them
    * (measured: 50-row shortlist = 0.58 mean recall@5 at 500 vectors but
    * 0.24 at 2 000; the 10% rule holds 0.52–0.60 across both with
    * min-per-query 0.2). The denominator is the corpus actually SEARCHED
    * — counted inside the ranking window itself, zero extra passes — not
    * the fit-time `model.corpusRows` (r12: in the
    * train-once/encode-forever path this index champions, the persisted
    * codebook's count stays pinned while ingestion grows the corpus, so
    * a fit-time budget reproduces exactly the cliff the auto rule exists
    * to remove). The cap is where the scaling argument flips: re-ranking
    * 10% of a 10^9-vector corpus would BE a corpus scan, and past ~10k
    * vectors the fix for fading ADC discrimination is more ADC
    * resolution (raise subspaces/k — a production PQ runs 8–16 subspaces
    * × 256 codes, not 4 × 16), never an unbounded shortlist. */
  def topK(
      spark: SparkSession,
      emb: DataFrame, // vec_id, embedding
      queries: DataFrame, // vec_id, embedding (small by construction)
      model: Model,
      k: Int = 5,
      shortlist: Int = 0
  ): DataFrame = topKCandidates(spark, emb, queries, model, k, shortlist, None)

  /** [[topK]] with an optional per-query CANDIDATE restriction — the
    * fusion seam [[AnnIvfPq]] plugs the IVF probe set into: when
    * `candidates` is Some((qid, vid) pairs), ADC scores exactly those
    * pairs instead of every (query, vector) combination, so the PQ stage
    * inherits whatever pruning produced the pairs (for IVF probes that
    * is the nprobe/nlist corpus fraction). The auto-shortlist rule then
    * sizes itself from the CANDIDATES actually ranked per query — the
    * same searched-corpus discipline as the unrestricted path. */
  private[operators] def topKCandidates(
      spark: SparkSession,
      emb: DataFrame, // vec_id, embedding
      queries: DataFrame, // vec_id, embedding (small by construction)
      model: Model,
      k: Int,
      shortlist: Int,
      candidates: Option[DataFrame] // (qid, vid); None = all pairs
  ): DataFrame =
    adcSearch(spark, emb, codes(spark, emb, model), queries, model, k, shortlist, candidates)

  /** The ADC + re-rank engine with the CODES handed in — the seam the
    * persisted IVF-PQ index ([[AnnIvfPq.searchIndex]]) plugs its STORED
    * code columns into (train-once/encode-once: a production index never
    * re-encodes the corpus per search, which `codes(...)` inline would).
    * `codesDf` must carry (vec_id, code0..code{subspaces-1}). */
  private[operators] def adcSearch(
      spark: SparkSession,
      emb: DataFrame, // vec_id, embedding — the re-rank side
      codesDf: DataFrame, // vec_id, code0..codeM-1
      queries: DataFrame, // vec_id, embedding (small by construction)
      model: Model,
      k: Int,
      shortlist: Int,
      candidates: Option[DataFrame], // (qid, vid); None = all pairs
      residualLut: Option[DataFrame] = None // (qid, cluster, m, code, d)
  ): DataFrame = {
    require(shortlist >= 0, s"shortlist must be >= 0 (0 = auto), got $shortlist")
    require(residualLut.isEmpty || candidates.nonEmpty,
      "a residual LUT needs candidate pairs carrying the cluster column")
    VectorFunctions.register(spark)
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StructField, StructType}
    // qid stays the CALLER's id type (long, int, string, ...) end to end —
    // the driver-side frames are built with an explicit schema carrying
    // queries' own vec_id type, like the id-agnostic joins AnnIvf/AnnLsh
    // use (a hard-coded getLong would crash any non-bigint-keyed corpus)
    val qidType = queries.schema("vec_id").dataType
    val queryVecs = queries
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.get(0) -> r.getSeq[Float](1).toArray)
    // The plain LUT keys (qid, m, code) — the query's own sub-vectors vs
    // the codebooks. Residual indexes ship their own per-probed-list LUT
    // instead (the query minus the LIST centroid — [[AnnIvfPq]] builds
    // it), so the plain one is skipped entirely in that mode.
    lazy val lut = {
      val lutRows = for {
        (qid, vec) <- queryVecs.toSeq
        m <- 0 until model.subspaces
        c <- 0 until model.codebooks(m).k
      } yield {
        val qs = vec
          .slice(m * model.subDim, (m + 1) * model.subDim)
          .map(KMeans.fixedPointLong)
        val cent = model.codebooks(m).centroids(c)
        val dist = qs.zip(cent).map { case (a, b) => val df0 = a - b; df0 * df0 }.sum
        Row(qid, m, c, dist)
      }
      spark.createDataFrame(
        lutRows.asJava,
        StructType(Seq(
          StructField("qid", qidType), StructField("m", IntegerType),
          StructField("code", IntegerType), StructField("d", LongType)))
      )
    }
    val unpivot = codesDf
      .select(
        col("vec_id"),
        explode(array((0 until model.subspaces).map(m =>
          struct(lit(m).as("m"), col(s"code$m").as("code"))
        ): _*)).as("mc")
      )
      .select(col("vec_id"), col("mc.m").as("m"), col("mc.code").as("code"))
    // Unrestricted: the (m, code)-keyed broadcast join fans every vector
    // out to every query (brute-force ADC). Restricted: the candidate
    // pairs arrive first, so the LUT join keys on (qid, m, code) and the
    // fan-out is exactly the candidate set. Residual: the candidate pairs
    // also carry the vector's LIST, and the LUT join adds it to the key —
    // each list's codes score against the query SHIFTED BY that list's
    // centroid, the FAISS IndexIVFPQ table discipline.
    val adcJoined = (candidates, residualLut) match {
      case (None, _) => unpivot.join(broadcast(lut), Seq("m", "code"))
      case (Some(cand), None) =>
        unpivot
          .join(cand.select(col("qid"), col("vid").as("vec_id")), "vec_id")
          .join(broadcast(lut), Seq("qid", "m", "code"))
      case (Some(cand), Some(rlut)) =>
        unpivot
          .join(cand.select(col("qid"), col("vid").as("vec_id"), col("cluster")), "vec_id")
          .join(broadcast(rlut), Seq("qid", "cluster", "m", "code"))
    }
    val adc = adcJoined
      .filter(col("vec_id") =!= col("qid"))
      .groupBy("qid", "vec_id")
      .agg(sum("d").as("adc"))
    val wPq = Window.partitionBy("qid").orderBy(col("adc"), col("vec_id"))
    val ranked = adc.withColumn("rnk", row_number().over(wPq))
    // The auto budget (shortlist = 0) derives from the corpus actually
    // SEARCHED, not the fit-time count: count(*) over the same qid
    // partition the ranking window already builds — zero extra corpus
    // passes, and the same shuffle/sort serves both window functions.
    // r12 fix: sizing from model.corpusRows silently reproduced the
    // fixed-shortlist recall cliff in the train-once/encode-forever path
    // (persisted codebook, corpus grown by later ingestion: the budget
    // stayed pinned to the old count while ADC ranks of true neighbors
    // drifted past it).
    val short =
      (if (shortlist > 0) ranked.filter(col("rnk") <= shortlist)
       else ranked
         .withColumn("__cnt", count(lit(1)).over(Window.partitionBy("qid")))
         .filter(col("rnk") <=
           greatest(lit(100L), least(floor(col("__cnt") / lit(10)), lit(1000L)))))
        .select(col("qid"), col("vec_id").as("vid"))
    val fp = KMeans.fixedPoint(emb, "embedding")
    // Query fixed-point vectors come from the QUERIES frame (driver-side,
    // via the scalar twin of fixedPoint — same space, spec-pinned), not a
    // corpus lookup: a query vector absent from `emb` would silently
    // drop every result row through the inner joins below, breaking the
    // corpus-and-queries-are-separate contract AnnIvf/AnnLsh honor.
    val qFp = spark.createDataFrame(
      queryVecs.toSeq
        .map { case (qid, vec) => Row(qid, vec.map(KMeans.fixedPointLong).toSeq) }
        .asJava,
      StructType(Seq(
        StructField("qid", qidType),
        StructField("qx", ArrayType(LongType, containsNull = false))))
    )
    val reranked = short
      .join(fp.select(col("vec_id").as("vid"), col("x").as("vx")), "vid")
      .join(broadcast(qFp), "qid")
      .select(col("qid"), col("vid"), expr("int_sqdist(qx, vx)").as("d2"))
    val wRr = Window.partitionBy("qid").orderBy(col("d2"), col("vid"))
    reranked
      .withColumn("rnk", row_number().over(wRr))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vid"), col("d2"))
      .orderBy("qid", "rnk")
  }
}
