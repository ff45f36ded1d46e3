package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins the PHYSICAL shard write (`LlmOps.writeShards`) against the t32
  * manifest it implements: the gated query proves the shard MATH
  * cross-engine; this spec proves the bytes on disk agree with that
  * math — per-shard membership, key ranges, training order inside each
  * file, and write determinism. */
class ShardWriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("written shards match the t32 manifest: dirs, counts, key ranges, in-file order") {
    import graft.queries.LlmOps
    val docs = Tables.documents(spark, TestSpark.sf001).select("doc_id", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString + "/out"
    LlmOps.writeShards(docs, dir)

    val manifest = LlmOps.shardManifestOf(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getString(4), r.getString(5))).toMap

    // one directory per manifest shard, nothing extra
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).map(_.stripPrefix("shard=")).toSet
    assert(dirs == manifest.keySet, s"shard dirs $dirs != manifest ${manifest.keySet}")

    for ((shard, (nDocs, firstKey, lastKey)) <- manifest) {
      val rows = spark.read.parquet(s"$dir/shard=$shard")
        .select(col("key"), input_file_name().as("f"))
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(rows.length.toLong == nDocs, s"shard $shard count ${rows.length} != $nDocs")
      assert(rows.map(_._1).min == firstKey && rows.map(_._1).max == lastKey,
        s"shard $shard key range disagrees with the manifest")
      // training order: within every file, keys ascend in row order
      for ((_, inFile) <- rows.groupBy(_._2))
        assert(inFile.map(_._1).toSeq == inFile.map(_._1).toSeq.sorted,
          s"shard $shard: a file is not in training (key) order")
    }

    // determinism: a second write lands the identical membership per shard
    val dir2 = java.nio.file.Files.createTempDirectory("graft-shards2").toString + "/out"
    LlmOps.writeShards(docs, dir2)
    for (shard <- manifest.keySet) {
      val a = spark.read.parquet(s"$dir/shard=$shard").select("doc_id", "key")
        .collect().map(_.toSeq).sortBy(_.toString)
      val b = spark.read.parquet(s"$dir2/shard=$shard").select("doc_id", "key")
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(a.toSeq == b.toSeq, s"shard $shard differs across identical writes")
    }
    Hygiene.release(spark)
  }
}
