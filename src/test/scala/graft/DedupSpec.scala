package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.LlmOps

/** Scale guards on the dedup family: the d03 stop-shingle cap must bound
  * inverted-index join fan-out even when one shingle appears in every
  * document (the adversarial boilerplate case the 100 TB design worries
  * about).
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("d07 expansion: a test copy with a same-split canonical still links its train twin") {
    import spark.implicits._
    // Three byte-identical docs; md5(doc_id)-nibble splits: 3 -> test,
    // 4 -> train, 5 -> test. The canonical is 3 (test). Star edges alone
    // emit only (3,4) cross-split and hide doc 5's train twin behind the
    // same-split (3,5) edge — the member-level expansion must surface
    // (4,5) so the leaked test doc 5 appears in the report.
    val docs = Seq(
      (3L, "the exact same document text in every split copy here"),
      (4L, "the exact same document text in every split copy here"),
      (5L, "the exact same document text in every split copy here")
    ).toDF("doc_id", "text")
    val out = LlmOps
      .splitLeakageOf(docs)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(out == Set(
      (3L, "test", 4L, "train"),
      (4L, "train", 5L, "test")
    ))
  }

  test("d18 strip: pure-boilerplate doc survives as empty; kept chunks keep position order") {
    import spark.implicits._
    def md5Hex(s: String): String =
      java.security.MessageDigest
        .getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map("%02x".format(_))
        .mkString
    // 16-token chunks, matching subdocWindow
    def chunk(p: String) = (1 to 16).map(i => s"$p$i").mkString(" ")
    val (a, b, cc, dd, ee) = (chunk("a"), chunk("b"), chunk("c"), chunk("d"), chunk("e"))
    val docs = Seq(
      (1L, s"$a $b"),  // shares chunk a with docs 2 and 3 -> keeps b
      (2L, s"$a $cc"), // keeps c
      (3L, a),         // PURE boilerplate: strips to the empty string
      (4L, s"$dd $a $ee") // kept chunks d, e must rejoin in that order
    ).toDF("doc_id", "text")
    val out = LlmOps
      .boilerplateStripOf(docs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    // every doc keeps its row — a fully-stripped doc is reported, not lost
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L) == ((2L, 1L, 16L, md5Hex(b))))
    assert(out(2L) == ((2L, 1L, 16L, md5Hex(cc))))
    // md5("") — the deterministic empty-doc fingerprint in both engines
    assert(out(3L) == ((1L, 0L, 0L, md5Hex(""))))
    // d then e, never e then d: the reassembly is position-ordered even
    // though the boilerplate chunk sat between them
    assert(out(4L) == ((3L, 2L, 32L, md5Hex(s"$dd $ee"))))
  }

  test("d19 substring dedup: canonical survives, runs merge, islands split on gaps") {
    import spark.implicits._
    def md5Hex(s: String): String =
      java.security.MessageDigest
        .getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map("%02x".format(_))
        .mkString
    def run(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val a12 = run("a", 12) // the canonical 12-token run (docs 1, 2, 3)
    val b8 = run("b", 8)
    val p8 = run("p", 8)
    val q8 = run("q", 8)
    val docs = Seq(
      (1L, a12),                      // canonical holder: NOT in the output
      (2L, s"$a12 x1 x2 x3 x4"),      // 12-token dup run -> ONE merged island
      (3L, a12),                      // exact copy -> whole-doc removal
      (4L, s"$b8 c1 c2 c3 c4 $b8"),   // internal repeat: second occurrence goes
      (10L, p8),                      // canonical for p8
      (11L, q8),                      // canonical for q8
      (12L, s"$p8 z1 $q8")            // two dup spans split by the z1 gap
    ).toDF("doc_id", "text")
    val out = LlmOps
      .substringDedupOf(docs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // docs whose every duplicated gram is ITS OWN canonical keep all text
    // and are absent from the removal report
    assert(out.keySet == Set(2L, 3L, 4L, 12L))
    // the 5 overlapping 8-gram spans tiling the 12-token run merge to one
    assert(out(2L) == ((1L, 12L, md5Hex("x1 x2 x3 x4"))))
    assert(out(3L) == ((1L, 12L, md5Hex(""))))
    // within one doc the FIRST occurrence is canonical; the repeat goes
    assert(out(4L) == ((1L, 8L, md5Hex(s"$b8 c1 c2 c3 c4"))))
    // two islands separated by one surviving token do not merge
    assert(out(12L) == ((2L, 16L, md5Hex("z1"))))
  }

  test("capShingles drops hot shingles and bounds self-join fan-out") {
    import spark.implicits._
    // 50 docs all share the stop shingle "S"; each also has one unique
    // shingle and doc i shares "P" with doc i+1 for i in 0..9.
    val rows =
      (0 until 50).map(i => (i.toLong, "S")) ++
        (0 until 50).map(i => (i.toLong, s"u$i")) ++
        (0 until 10).map(i => (i.toLong, "P"))
    val sh = rows.toDF("doc_id", "sh")

    val capped = LlmOps.capShingles(sh, maxDf = 10L)
    // "S" (df=50) is gone; "P" (df=10) and the uniques survive
    val survivors = capped.select("sh").distinct().as[String].collect().toSet
    assert(!survivors.contains("S"))
    assert(survivors.contains("P"))
    assert(survivors.count(_.startsWith("u")) == 50)

    // fan-out bound: the inverted-index self-join over the capped universe
    // produces at most sum(df_i choose 2) <= n_shingles * maxDf^2 pairs;
    // here only "P" pairs up: C(10,2) = 45. Uncapped, "S" alone would add
    // C(50,2) = 1225.
    val pairs = capped
      .as("a")
      .join(capped.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .count()
    assert(pairs == 45L)
  }

  test("minhash hot bucket: 10k identical docs yield a linear star, not a quadratic clique") {
    import spark.implicits._
    // The adversarial pre-dedup corpus: 10,000 byte-identical documents
    // (plus two genuine near-dups to prove banding still fires). Clique
    // semantics would emit C(10000,2) ~ 5e7 pairs through ONE band-bucket
    // reducer; the built-in exact-dup collapse must emit exactly 9,999
    // star edges from the canonical plus the one near-dup pair.
    val identical = (0L until 10000L).map(i => (i, "the same exact document text repeated"))
    val nearDups = Seq(
      (20000L, "alpha beta gamma delta epsilon zeta eta theta"),
      (20001L, "alpha beta gamma delta epsilon zeta eta theta iota")
    )
    val docs = (identical ++ nearDups).toDF("doc_id", "text")

    val pairs = LlmOps.minhashPairsOf(docs).cache()
    try {
      // Every edge inside the identical-doc set must come FROM the
      // canonical (doc 0): a dup-dup edge would mean the clique leaked.
      val dupDup = pairs
        .filter(col("doc_a") =!= 0L && col("doc_b") < 10000L)
        .count()
      assert(dupDup == 0L, s"clique leaked: $dupDup dup-dup pairs")
      val star = pairs.filter(col("doc_a") === 0L && col("doc_b") < 10000L).count()
      assert(star == 9999L, s"expected 9999 star edges, got $star")
      // banding still fires on genuine near-dups (6/7 shared shingles)
      val near = pairs
        .filter(col("doc_a") === 20000L && col("doc_b") === 20001L)
        .count()
      assert(near == 1L, "near-dup pair lost by the collapse")
      assert(pairs.count() == 10000L)
    } finally pairs.unpersist()
  }

  test("BoundedCollectSet caps per-key state and drops overflow keys exactly") {
    import spark.implicits._
    // hot key "S" has 50 distinct members (plus duplicates), "P" exactly 10,
    // "q" has 3 with duplicates
    val rows =
      (0 until 50).map(i => ("S", i.toLong)) ++
        (0 until 50).map(i => ("S", i.toLong)) ++ // dups must not count
        (0 until 10).map(i => ("P", i.toLong)) ++
        Seq(("q", 1L), ("q", 1L), ("q", 2L), ("q", 3L))
    val df = rows.toDF("k", "v").repartition(8) // force partial-agg merges
    val sets = df
      .groupBy("k")
      .agg(graft.functions.BoundedCollectSet.boundedSet(col("v"), 10).as("vs"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSet)
      .toMap
    assert(sets("S").isEmpty, "key over the bound must emit empty (dropped)")
    assert(sets("P") == (0 until 10).map(_.toLong).toSet,
      "key exactly at the bound keeps its complete set")
    assert(sets("q") == Set(1L, 2L, 3L), "duplicates dedup below the bound")
  }

  test("BoundedCollectSet skips NULL values like collect_set") {
    import spark.implicits._
    // primitive-encoder formulation aborted the job on the NULL row
    // ("Null value appeared in non-nullable field"); collect_set skips it
    val df = Seq(("a", Some(1L)), ("a", None: Option[Long]), ("a", Some(2L)),
      ("b", None: Option[Long]))
      .toDF("k", "v").repartition(4)
    val sets = df
      .groupBy("k")
      .agg(graft.functions.BoundedCollectSet.boundedSet(col("v"), 10).as("vs"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSet)
      .toMap
    assert(sets("a") == Set(1L, 2L))
    assert(sets("b").isEmpty, "all-NULL key aggregates to the empty set, not a crash")
  }

  test("simhash16 kernel matches the exploded grouped-sum reference formulation") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    // adversarial shapes: empty doc, whitespace-only, repeated tokens
    // (occurrence weighting, not distinct), unicode, single token
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, ""),
      (2L, "   "),
      (3L, "a a a a b"),
      (4L, "日本語 テスト 日本語"),
      (5L, "solo")
    ) ++ (6L until 60L).map(i => (i, s"token$i shared words appear here ${i % 7}"))
    val df = docs.toDF("doc_id", "text")

    val compiled = df
      .select(col("doc_id"),
        expr("simhash16(array_remove(split(lower(text), ' '), ''))").as("simhash"))
      .filter(col("simhash").isNotNull)

    // the pre-round-3 formulation, kept as the semantic oracle
    val tok = df
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("h", md5(col("tok")))
    val hexHigh = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val sums = (0 until 16).map(i =>
      sum(when(substring(col("h"), i + 1, 1).isin(hexHigh: _*), 1).otherwise(-1)).as(s"s$i"))
    val fp = (0 until 16)
      .map(i => when(col(s"s$i") > 0, lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _)
    val reference = tok.groupBy("doc_id").agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), fp.cast("int").as("simhash"))

    val got = compiled.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = reference.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == want)
    assert(!got.contains(1L) && !got.contains(2L), "token-less docs must drop")

    // interpreted eval path (codegen fallback) agrees with codegen
    val interp = graft.functions.TextKernels.simhash16(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array("the", "quick", "brown", "fox", "jumps", "over", "the", "lazy", "dog")
          .map(org.apache.spark.unsafe.types.UTF8String.fromString)))
    assert(interp == want(0L))
    assert(graft.functions.TextKernels.simhash16(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array.empty[org.apache.spark.unsafe.types.UTF8String])) == -1)
  }

  test("simhash64 kernel matches the exploded grouped-sum reference formulation") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, ""),
      (2L, "   "),
      (3L, "a a a a b"),
      (4L, "日本語 テスト 日本語"),
      (5L, "solo")
    ) ++ (6L until 60L).map(i => (i, s"token$i shared words appear here ${i % 7}"))
    val df = docs.toDF("doc_id", "text")

    val compiled = df
      .select(col("doc_id"),
        expr("simhash64(array_remove(split(lower(text), ' '), ''))").as("simhash"))
      .filter(col("simhash").isNotNull)

    // exploded grouped-sum reference with the same bit convention:
    // fingerprint bit i voted by bit (3 - (i&3)) of hex-nibble (i>>2)
    val tok = df
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("h", md5(col("tok")))
    val sums = (0 until 64).map { i =>
      val nib = conv(substring(col("h"), (i >> 2) + 1, 1), 16, 10).cast("int")
      sum(when(shiftright(nib, 3 - (i & 3)).bitwiseAND(lit(1)) === 1, 1).otherwise(-1))
        .as(s"s$i")
    }
    val fp = (0 until 64)
      .map(i => when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    val reference = tok.groupBy("doc_id").agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), fp.cast("long").as("simhash"))

    val got = compiled.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = reference.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(!got.contains(1L) && !got.contains(2L), "token-less docs must drop")
    // fingerprints genuinely use the upper 32 bits (the whole point of the
    // wider kernel) — at least one doc's fingerprint has a high bit set
    assert(got.values.exists(v => (v >>> 32) != 0L), "upper 32 bits never set")

    // interpreted eval path (codegen fallback) agrees with codegen
    val interp = graft.functions.TextKernels.simhash64(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array("the", "quick", "brown", "fox", "jumps", "over", "the", "lazy", "dog")
          .map(org.apache.spark.unsafe.types.UTF8String.fromString)))
    assert(interp == want(0L))
    assert(graft.functions.TextKernels.simhash64(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array.empty[org.apache.spark.unsafe.types.UTF8String])) == null)
  }

  test("d20 salted domain cap: exact on a skewed corpus, for any salt count") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // one mega-domain (the hot-reducer case the salting exists for),
    // one small domain, one domain under the cap, plus n_chars ties
    // broken by doc_id
    val rows =
      (1L to 500L).map(i => (i, "big", (i % 7) * 10)) ++
        (501L to 520L).map(i => (i, "mid", 100L)) ++
        (521L to 523L).map(i => (i, "tiny", 5L))
    val docs = rows.toDF("doc_id", "source", "n_chars")
    val naive = docs
      .withColumn("rank", row_number().over(
        Window.partitionBy("source").orderBy(col("n_chars").desc, col("doc_id").asc)))
      .filter(col("rank") <= 25)
      .select("source", "rank", "doc_id", "n_chars")
      .collect().map(_.toSeq).toSet
    for (salts <- Seq(1, 3, 8, 64)) {
      val got = LlmOps.domainCapOf(docs, cap = 25, salts = salts)
        .collect().map(_.toSeq).toSet
      assert(got == naive, s"salted cap diverged from the naive window at salts=$salts")
    }
    // under-cap domain keeps everything
    assert(naive.count(_.head == "tiny") == 3)
  }

  test("d22 contamination: copied-from-train eval doc flags; fresh doc does not") {
    import spark.implicits._
    // split is md5(doc_id)-nibble-derived; pick ids by computing it here
    def nib(id: Long) = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      "%02x".format(d(0)).charAt(0)
    }
    val ids = (1L to 400L)
    val trainIds = ids.filter(i => !"cdef".contains(nib(i))).take(2)
    val testIds = ids.filter(i => "ef".contains(nib(i))).take(2)
    val trainA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val trainB = "one two three four five six seven eight nine ten"
    // decisive poles of the 70% rule: a verbatim train copy (all 3 of its
    // 8-grams hit) and a fully novel doc (zero hits)
    val copied = trainA
    val fresh = "red orange yellow green blue indigo violet umber sienna ochre"
    val docs = Seq(
      (trainIds(0), trainA), (trainIds(1), trainB),
      (testIds(0), copied), (testIds(1), fresh)
    ).toDF("doc_id", "text")
    val out = LlmOps.contaminationOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq.sortBy(_._1)
    val byId = out.map(r => r._1 -> r).toMap
    assert(out.map(_._1).toSet == testIds.toSet, "only test-split docs are scored")
    val (_, ng0, nh0, c0) = byId(testIds(0))
    assert(ng0 == 3 && nh0 == 3 && c0, "verbatim copy must flag with all grams hit")
    val (_, ng1, nh1, c1) = byId(testIds(1))
    assert(ng1 == 3 && nh1 == 0 && !c1, "novel doc must not flag")
  }

  test("d21 pagerank: hub outranks leaves, mass bounded, empty graph yields empty frame") {
    import spark.implicits._
    // star: 1 is the hub of 2,3,4; 5-6 an isolated pair
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L)).toDF("doc_a", "doc_b")
    val got = LlmOps.dupGraphRankOf(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    // the hub absorbs its three leaves' full mass each round
    assert(got(1L) > got(2L) && got(2L) == got(3L) && got(3L) == got(4L))
    // the isolated pair is symmetric
    assert(got(5L) == got(6L))
    // fixed-point mass stays bounded by the initial unit (floors only lose)
    assert(got.values.sum <= 1000000000L)
    assert(got.values.forall(_ > 0L))
    // empty graph: typed empty frame, no divide-by-zero
    val none = LlmOps.dupGraphRankOf(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"))
    assert(none.collect().isEmpty)
    assert(none.columns.toSeq == Seq("doc_id", "rank_units"))
  }

  test("d23 survivor packing survives n_chars beyond 2^31 (the r8 BIGINT wrap)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, max_by}
    // the old `n_chars * 2^32 - doc_id` BIGINT packing wrapped at
    // n_chars >= 2^31 and (ANSI off) silently selected a wrong survivor;
    // the DECIMAL(28,0) widening d23 now ships must rank correctly there.
    // 3e9 chars: the wrap region. Ties on n_chars -> smaller doc_id wins.
    val rows = Seq(
      (1L, 10L, 3000000000L), (1L, 3L, 3000000000L), (1L, 7L, 4L),
      (2L, 99L, 5L), (2L, 98L, 2147483648L)
    ).toDF("cluster_id", "doc_id", "n_chars")
    val got = rows
      .groupBy("cluster_id")
      .agg(max_by(
        col("doc_id"),
        col("n_chars").cast("decimal(28,0)") * lit(4294967296L) - col("doc_id")
      ).as("kept_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 98L), s"wide packing mis-ranked: $got")
  }

  test("d28: edit distance validates the candidate graph with hand-computed distances") {
    import spark.implicits._
    // short enough (53/56 chars) that BOTH texts fit whole inside the
    // 64-char prefix — a longer base makes the inserted spaces also
    // shift content out of the window and the distance reads 2x
    val base = "the quick brown fox jumps over the lazy dog once more"
    val docs = Seq(
      (1L, base),
      (2L, base), // exact dup -> star edge, distance 0
      // three EXTRA SPACES: tokenization (split + drop empties) is
      // unchanged, so shingles/signature/bands are identical to doc 1
      // (guaranteed candidate, jaccard 1) while the raw lowered prefix
      // differs by exactly the three insertions
      (3L, "the  quick  brown  fox jumps over the lazy dog once more"),
      (4L, "completely unrelated words about solar panels wind farms and tidal energy systems")
    ).toDF("doc_id", "text")
    val got = LlmOps.editDistPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    assert(got == Seq((1L, 2L, 0), (1L, 3L, 3)),
      "expected the exact-dup star edge at 0 and the spaced twin at 3 edits")
    // sequence-sensitivity: same WORDS reordered share every shingle-set
    // property a bag model sees, but the edit distance must be large
    val shuffled = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (2L, "mu lambda kappa iota theta eta zeta epsilon delta gamma beta alpha")
    ).toDF("doc_id", "text")
    val far = LlmOps.editDistPairs(shuffled, maxDist = 1000).collect()
    assert(far.forall(_.getInt(2) > 16),
      "reordered tokens must fail the sequence-similarity bar even if banded")
    Hygiene.release(spark)
  }
}
