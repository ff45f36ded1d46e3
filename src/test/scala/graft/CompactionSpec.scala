package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the compaction plan (t37) beyond the cross-engine hash: plan
  * completeness (every manifest file lands in exactly one bin, byte
  * totals conserved) and — the verdict-gate discipline — that `fill_ok`
  * is FALSIFIABLE: the identical verdict expression over a broken packing
  * (everything into one bin) reads false, so the gated all-true column is
  * evidence about the packer, not a tautology of the SQL. */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val target = 4000L

  /** The t37 manifest, rebuilt independently of the query. */
  private def manifest: DataFrame =
    Tables.documents(spark, TestSpark.sf0001)
      .groupBy(
        col("source"),
        substring(md5(concat(lit("file|"), col("doc_id").cast("string"))), 1, 1).as("nib"))
      .agg(sum(col("n_chars")).as("bytes"))

  test("t37: every manifest file is planned exactly once, bytes conserved") {
    val plan = graft.queries.Registry.queries("t37_compaction_plan")(spark, TestSpark.sf0001)
      .collect()
    val m = manifest.collect()
    assert(plan.map(_.getLong(2)).sum == m.length.toLong,
      "planned file count != manifest file count")
    assert(plan.map(_.getLong(3)).sum == m.map(_.getLong(2)).sum,
      "planned bytes != manifest bytes")
    // the packing objective actually bites at this tier: multi-file bins
    // exist (bin-packing happened, not one-file-per-bin passthrough)
    assert(plan.exists(_.getLong(2) > 1), "no bin packs more than one file")
    assert(plan.forall(_.getBoolean(5)), "a correctly packed bin failed its own bound")
    Hygiene.release(spark)
  }

  test("t37: the fill_ok verdict reads FALSE under a broken packer") {
    // poison the packing rule: every file of a source into bin 0 — the
    // verdict expression is byte-for-byte the query's
    val poisoned = manifest
      .withColumn("bin", lit(0L))
      .groupBy("source", "bin")
      .agg(
        count(lit(1)).as("n_files"),
        sum(col("bytes")).as("bytes"),
        max(col("bytes")).as("largest_file"),
        (sum(col("bytes")) < lit(target) + max(col("bytes"))).as("fill_ok"))
      .collect()
    assert(poisoned.exists(!_.getBoolean(5)),
      "one-bin-per-source packing still passed the fill bound — the verdict is vacuous")
    Hygiene.release(spark)
  }
}
