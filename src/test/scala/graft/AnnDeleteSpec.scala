package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AnnIvf, SnapshotLog}

/** Pins the tombstone-delete contract of the persisted IVF index
  * (AnnIvf.deleteFromIndex / e23): deletes are visible to the NEXT search
  * with no vector rewrite; rebuild and compaction physically purge and
  * clear the ledger without changing any search result; and the e23
  * verdict column can actually read false (the poisoned-path discipline). */
class AnnDeleteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshIdx(tag: String): String =
    Files.createTempDirectory(s"graft-anndel-$tag-").toString + "/ivf"

  private def corpus = {
    import spark.implicits._
    (0 until 200)
      .map(i => (i.toLong, Array.tabulate(8)(d => ((i * 31 + d * 7) % 97) / 48.5f - 1f)))
      .toDF("vec_id", "embedding")
  }

  private def topVids(path: String, q: org.apache.spark.sql.DataFrame, k: Int = 5) =
    AnnIvf.searchIndex(spark, path, q, k = k, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2)))

  test("a tombstoned id disappears from the next search; survivors shift up") {
    val emb = corpus
    val idx = freshIdx("visible")
    AnnIvf.buildIndex(spark, emb, idx, nlist = 4)
    val q = emb.filter(col("vec_id") === 0)
    val before = topVids(idx, q)
    assert(before.length == 5)
    val victim = before.head._2 // the current rank-1 neighbor
    import spark.implicits._
    AnnIvf.deleteFromIndex(spark, Seq(victim).toDF("vec_id"), idx)
    val after = topVids(idx, q)
    assert(!after.map(_._2).contains(victim), "tombstoned id surfaced after delete")
    assert(after.length == 5, "k must stay full — the corpus has plenty of live vectors")
    // the old ranks 2..5 are still there (they only moved up)
    assert(before.map(_._2).drop(1).toSet.subsetOf(after.map(_._2).toSet))
    Hygiene.release(spark)
  }

  test("rebuild purges tombstoned rows and clears the ledger; results stay tombstone-free") {
    import spark.implicits._
    val emb = corpus
    val idx = freshIdx("rebuild")
    AnnIvf.buildIndex(spark, emb, idx, nlist = 4)
    val dead = (0 until 200 by 9).map(_.toLong)
    AnnIvf.deleteFromIndex(spark, dead.toDF("vec_id"), idx)
    AnnIvf.rebuildIndex(spark, idx, nlist = 4)
    val snap = SnapshotLog.current(spark, idx, "ivf-index")
    assert(snap.tables.getOrElse("tombstones", Nil).isEmpty, "rebuild must clear the ledger")
    assert(snap.props("rows").toLong == 200L - dead.length, "rebuild must purge physically")
    val q = emb.filter(col("vec_id") === 1)
    assert(topVids(idx, q).map(_._2).toSet.intersect(dead.toSet).isEmpty)
    Hygiene.release(spark)
  }

  test("compaction purges + clears the ledger and search results are identical") {
    import spark.implicits._
    val emb = corpus
    val idx = freshIdx("compact")
    AnnIvf.buildIndex(spark, emb, idx, nlist = 4)
    val dead = Seq(3L, 44L, 101L)
    AnnIvf.deleteFromIndex(spark, dead.toDF("vec_id"), idx)
    val q = emb.filter(col("vec_id") < 3)
    val before = topVids(idx, q).toSeq
    AnnIvf.compactIndex(spark, idx)
    val snap = SnapshotLog.current(spark, idx, "ivf-index")
    assert(snap.tables.getOrElse("tombstones", Nil).isEmpty, "compaction must clear the ledger")
    assert(snap.props("rows").toLong == 197L, "compaction must drop the dead rows")
    assert(snap.tables("vectors").length == 1)
    val after = topVids(idx, q).toSeq
    assert(after == before, "purging already-excluded rows must not change any result")
    Hygiene.release(spark)
  }

  test("compaction refuses an all-tombstoned store instead of committing a fileless dir") {
    import spark.implicits._
    val emb = corpus.limit(20)
    val idx = freshIdx("alldead")
    AnnIvf.buildIndex(spark, emb, idx, nlist = 2)
    AnnIvf.deleteFromIndex(spark, (0L until 20L).toDF("vec_id"), idx)
    val vBefore = SnapshotLog.current(spark, idx, "ivf-index").version
    val e = intercept[IllegalStateException] { AnnIvf.compactIndex(spark, idx) }
    assert(e.getMessage.contains("every stored vector tombstoned"))
    // the refusal must leave the store untouched and still readable
    assert(SnapshotLog.current(spark, idx, "ivf-index").version == vBefore,
      "a refused compaction must not commit")
    assert(topVids(idx, emb.filter(col("vec_id") === 0)).isEmpty,
      "all-tombstoned search is empty but must not error")
    Hygiene.release(spark)
  }

  test("knn graph: neighbors stay within a vector's own tight group") {
    import spark.implicits._
    // two well-separated groups of 6 near-identical vectors each: every
    // vector's top-3 neighbors must come from its own group
    def v(base: Float, j: Int) = Array.tabulate(8)(d =>
      (if (d < 4) base else -base) + j * 0.001f)
    val emb = ((0 until 6).map(j => (j.toLong, v(1f, j))) ++
      (0 until 6).map(j => (10L + j, v(-1f, j)))).toDF("vec_id", "embedding")
    val g = AnnIvf.knnGraph(spark, emb, k = 3, nlist = 2, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(g.nonEmpty)
    assert(g.forall { case (q, n) => (q < 10) == (n < 10) },
      s"a neighbor crossed the group boundary: ${g.mkString(",")}")
    // every vector got a full k=3 list (its group has 5 candidates)
    assert(g.groupBy(_._1).forall(_._2.length == 3))
    Hygiene.release(spark)
  }

  test("poisoned path: the no_deleted_ok verdict reads FALSE when a deleted id surfaces") {
    import spark.implicits._
    val queries = Seq(1L, 2L).toDF("vec_id")
    val deleted = Seq(7L).toDF("vec_id")
    val poisoned = Seq((1L, 7L), (1L, 9L), (2L, 11L)).toDF("qid", "vid")
    val got = graft.queries.LlmOps
      .noDeletedVerdict(queries, poisoned, deleted)
      .orderBy("qid").collect().map(r => (r.getLong(0), r.getBoolean(1)))
    assert(got.toSeq == Seq((1L, false), (2L, true)))
    Hygiene.release(spark)
  }
}
