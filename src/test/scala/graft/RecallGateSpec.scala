package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The per-qid recall FLOOR contract of the six ANN recall gates
  * (e05/e07/e11/e12/e18 via LlmOps.recallGate, d14 via
  * LlmOps.detectionGate): the mean verdict tolerates one dead query
  * out of ten behind nine strong ones — the floor verdict must not.
  * These specs poison exactly one qid / one bucket and assert the
  * frame the DuckDB oracle pins (TRUE on every row) now carries a
  * FALSE, i.e. the collapse fails CORRECTNESS on its own row instead
  * of averaging away.
  */
class RecallGateSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  /** 10 qids x k=5 exact rows. */
  private def exactSide = (for { q <- 0L until 10L; v <- 0L until 5L }
    yield (q, q * 100 + v)).toDF("qid", "vid")

  test("poisoned qid: one dead query out of ten passes the mean but fails the floor") {
    val exact = exactSide
    // approx finds everything except qid 7, which finds NOTHING
    val approx = exact.filter($"qid" =!= 7L)
    val out = graft.queries.LlmOps
      .recallGate(exact, approx, threshold = 0.7, floor = 0.2)
      .collect()
    assert(out.length === 10)
    // the mean verdict (0.9 >= 0.7) is green on every row — exactly the
    // blind spot: the dead query hides behind the other nine
    assert(out.forall(_.getAs[Boolean]("recall_ok")))
    // ...but the floor verdict is FALSE on precisely the dead qid's row
    val floorFails = out.filter(!_.getAs[Boolean]("recall_floor_ok")).map(_.getAs[Long]("qid"))
    assert(floorFails.toSeq === Seq(7L))
  }

  test("healthy and grazing qids clear the floor") {
    val exact = exactSide
    // qid 3 keeps exactly 1 of 5 neighbors (recall 0.2): AT the floor
    val approx = exact.filter($"qid" =!= 3L || $"vid" === 300L)
    val out = graft.queries.LlmOps
      .recallGate(exact, approx, threshold = 0.7, floor = 0.2)
      .collect()
    assert(out.length === 10)
    assert(out.forall(_.getAs[Boolean]("recall_floor_ok")))
  }

  test("poisoned bucket: a regional detection collapse fails the bucket floor per-row") {
    // 200 vecs, ~90% detected overall (mean bar 0.7 clears), EXCEPT the
    // vecs hashing into bucket 2, none of which are detected — the
    // regional collapse d14's floor exists to catch
    val exact = (0L until 200L).toDF("vec_id")
    val bucketed = exact.withColumn("bucket", pmod(xxhash64($"vec_id"), lit(4L)))
    val detected = bucketed
      .filter($"bucket" =!= 2L && pmod($"vec_id", lit(10L)) =!= 0L)
      .select("vec_id")
    val out = graft.queries.LlmOps
      .detectionGate(exact, detected, meanBar = 0.6, bucketFloor = 0.5)
      .collect()
    assert(out.length === 200)
    assert(out.forall(_.getAs[Boolean]("recall_ok")), "mean verdict hides the collapse")
    val expected = bucketed.filter($"bucket" === 2L).count()
    val floorFails = out.count(!_.getAs[Boolean]("recall_floor_ok"))
    assert(floorFails === expected, "exactly the dead bucket's rows carry FALSE")
    assert(floorFails > 0)
  }

  test("caller-supplied region buckets catch a collapse that hash buckets dilute") {
    // 160 vecs in 4 REGIONS of 40 (the caller's bucket column — d14 uses
    // embedding-space k-means clusters). Region 2 collapses entirely;
    // everything else is detected. Hash buckets would spread the 40 dead
    // vecs uniformly (~10 per hash bucket → every bucket at ~0.75, gate
    // green) — the region buckets must flag exactly the dead region.
    val exact = (0L until 160L).map(v => (v, v % 4)).toDF("vec_id", "bucket")
    val detected = exact.filter($"bucket" =!= 2L).select("vec_id")
    // hash-bucket dilution, shown on the same fixture: every hash bucket
    // holds ~3/4 detected rows, so the fallback floor stays green
    val hashOut = graft.queries.LlmOps
      .detectionGate(exact.select("vec_id"), detected, meanBar = 0.7, bucketFloor = 0.5)
      .collect()
    assert(hashOut.forall(_.getAs[Boolean]("recall_floor_ok")),
      "hash buckets were expected to dilute the regional collapse on this fixture")
    // region buckets: exactly the dead region's 40 rows carry FALSE
    val out = graft.queries.LlmOps
      .detectionGate(exact, detected, meanBar = 0.7, bucketFloor = 0.5)
      .collect()
    assert(out.length === 160)
    assert(out.forall(_.getAs[Boolean]("recall_ok")), "mean verdict hides the collapse")
    val floorFails = out.filter(!_.getAs[Boolean]("recall_floor_ok")).map(_.getAs[Long]("vec_id"))
    assert(floorFails.length === 40)
    assert(floorFails.forall(_ % 4 == 2), "only the dead region's rows may carry FALSE")
  }

  test("a duplicate-emitting detector cannot inflate the detection rate") {
    val exact = (0L until 10L).toDF("vec_id")
    // detector finds only 5 vecs but emits each THREE times: a naive
    // left join would yield 15 detected rows over 20 total (rate 0.75 >=
    // 0.7) and duplicate the output row set; the gate must see rate 0.5
    val detected = (0L until 5L).flatMap(v => Seq(v, v, v)).toDF("vec_id")
    val out = graft.queries.LlmOps
      .detectionGate(exact, detected, meanBar = 0.7, bucketFloor = 0.0)
      .collect()
    assert(out.length === 10, "duplicates must not multiply output rows")
    assert(out.forall(!_.getAs[Boolean]("recall_ok")), "rate is 0.5, the mean bar must fail")
  }

  test("fully healthy detection keeps every floor verdict TRUE") {
    val exact = (0L until 100L).toDF("vec_id")
    val out = graft.queries.LlmOps
      .detectionGate(exact, exact, meanBar = 0.7, bucketFloor = 0.5)
      .collect()
    assert(out.length === 100)
    assert(out.forall(r => r.getAs[Boolean]("recall_ok") && r.getAs[Boolean]("recall_floor_ok")))
  }

  // ---- r13 poisoned paths for the structural-verdict surfaces that
  // closed the last no_oracle rows (e04/e06 via annStructuralVerdicts,
  // d13 via decontamVerdicts): each verdict must read FALSE on the exact
  // regression it names, or the oracle's pinned TRUE is vacuous.

  test("ANN structural verdicts: each poison flips exactly its own verdict") {
    val queries = (0L until 5L).toDF("vec_id")
    val healthyRows = for { q <- 0L until 5L; i <- 1L to 5L }
      yield (q, q * 100 + i, 0.9 - i * 0.01)
    val poison = Seq(
      (0L, 0L * 100 + 6L, 0.5), // qid 0: 6th neighbor -> k_bounded_ok false
      (1L, 1L, 0.99), // qid 1: returns itself -> no_self_ok false
      (2L, 2L * 100 + 1L, 0.89), // qid 2: duplicate vid -> no_dup_ok false
      (3L, 3L * 100 + 9L, 1.5) // qid 3: cosine out of range -> cosine_ok false
    )
    // each poison row also bumps its qid's count to 6 — drop one healthy
    // row from qids 1-3 so ONLY the named verdict flips there (qid 0 IS
    // the over-cap poison, so it keeps all 5 + the 6th)
    val rows = healthyRows.filterNot(r =>
      (r._1 == 1L && r._2 == 105L) ||
        (r._1 == 2L && r._2 == 205L) ||
        (r._1 == 3L && r._2 == 305L)) ++ poison
    def verdicts(tk: Seq[(Long, Long, Double)]) = graft.queries.LlmOps
      .annStructuralVerdicts(queries, tk.toDF("qid", "vid", "cosine"), k = 5)
      .collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))
      .toMap
    val healthy = verdicts(healthyRows)
    assert(healthy.values.forall(v => v._1 && v._2 && v._3 && v._4),
      "healthy top-k must pass every verdict")
    val v = verdicts(rows)
    assert(v(0L) == ((false, true, true, true)), s"qid 0 over-cap: ${v(0L)}")
    assert(v(1L) == ((true, false, true, true)), s"qid 1 self-hit: ${v(1L)}")
    assert(v(2L) == ((true, true, false, true)), s"qid 2 dup vid: ${v(2L)}")
    assert(v(3L)._1 && v(3L)._2 && v(3L)._3 && !v(3L)._4, s"qid 3 cosine oob: ${v(3L)}")
    assert(v(4L) == ((true, true, true, true)), "untouched qid stays green")
  }

  test("d13 decontam verdicts: eval-side hit, over-cap qid, sub-threshold cosine each read FALSE") {
    // deterministic eval ids: vec_ids whose md5 first nibble is e/f —
    // the same split rule d13 uses, computed here driver-side
    def nib(i: Long): Char = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
      "%02x".format(d(0)).charAt(0)
    }
    val ids = (0L until 200L)
    val evalIds = ids.filter(i => nib(i) == 'e' || nib(i) == 'f').take(4)
    val trainIds = ids.filter(i => nib(i) != 'e' && nib(i) != 'f').take(60)
    assert(evalIds.size == 4 && trainIds.size == 60)
    val Seq(e0, e1, e2, e3) = evalIds
    val evalSet = evalIds.toDF("vec_id")
    val healthyHits = Seq((e0, trainIds(0), 0.9), (e1, trainIds(1), 0.8))
    val poison =
      Seq((e0, e1, 0.9)) ++ // eval-side hit: split leaked into detection
        (0 until 51).map(i => (e1, trainIds(i % 60), 0.5 + i * 0.001)) ++ // 53 hits > cap
        Seq((e2, trainIds(2), 0.2)) // below the 0.35 bar
    def verdicts(hits: Seq[(Long, Long, Double)]) = graft.queries.LlmOps
      .decontamVerdicts(evalSet, hits.toDF("qid", "vid", "cosine"))
      .collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
      .toMap
    val healthy = verdicts(healthyHits)
    assert(healthy.values.forall(v => v._1 && v._2 && v._3),
      "healthy hits must pass every verdict (including undetected eval rows)")
    assert(healthy.size == 4, "every eval vec emits a row, detected or not")
    val v = verdicts(healthyHits ++ poison)
    assert(!v(e0)._2 && v(e0)._1 && v(e0)._3, s"e0 eval-side hit: ${v(e0)}")
    assert(!v(e1)._1, s"e1 over-cap: ${v(e1)}")
    assert(!v(e2)._3 && v(e2)._1 && v(e2)._2, s"e2 sub-threshold: ${v(e2)}")
    assert(v(e3) == ((true, true, true)), "untouched eval vec stays green")
  }
}
