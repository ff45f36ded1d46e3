package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Io
import graft.operators.SkewJoin

class IoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("io-spec").toString

  test("parquet round trip preserves schema and rows") {
    val dir = tmp() + "/li"
    val df = Tables.lineitem(spark, TestSpark.sf0001)
    Io.writeParquet(df, dir)
    val back = Io.readParquet(spark, dir)
    assert(back.schema == df.schema)
    assert(back.count() == df.count())
  }

  test("csv and json round trips") {
    val base = tmp()
    val df = Tables.nation(spark, TestSpark.sf0001)
    Io.writeCsv(df, s"$base/csv")
    assert(Io.readCsv(spark, s"$base/csv").count() == df.count())
    Io.writeJson(df, s"$base/json")
    assert(Io.readJson(spark, s"$base/json").count() == df.count())
  }

  test("partitioned write enables partition pruning") {
    val dir = tmp() + "/events_by_type"
    Io.writePartitioned(
      Tables.events(spark, TestSpark.sf0001), dir, Seq("event_type"))
    val pruned = Io.readParquet(spark, dir).filter(col("event_type") === "error")
    // the pruned scan must read only the error partition directory
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_type"), s"no partition pruning in:\n$plan")
    val expected = Tables
      .events(spark, TestSpark.sf0001)
      .filter(col("event_type") === "error")
      .count()
    assert(pruned.count() == expected)
  }

  test("bucketed tables join without a shuffle") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    info(s"warehouse: $wh")
    // a previous JVM's managed-table locations survive the catalog; clear
    for (t <- Seq("orders_b", "lineitem_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(new java.net.URI(wh).getPath, t)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    Io.writeBucketed(
      Tables.orders(spark, TestSpark.sf0001).select("o_orderkey", "o_totalprice"),
      "orders_b", "o_orderkey", 8, Some("o_orderkey"))
    Io.writeBucketed(
      Tables.lineitem(spark, TestSpark.sf0001).select("l_orderkey", "l_quantity"),
      "lineitem_b", "l_orderkey", 8, Some("l_orderkey"))
    val joined = spark
      .table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() == Tables.lineitem(spark, TestSpark.sf0001).count())
  }

  test("salted join equals the plain join on skewed data") {
    import spark.implicits._
    // 90% of left rows hit one key — the skew pattern
    val left = (0 until 5000)
      .map(i => (if (i % 10 == 0) i.toLong % 100 else 7L, i.toLong))
      .toDF("k", "payload")
    val right = (0L until 100L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = left.join(right, "k")
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", saltBuckets = 8)
    assert(salted.count() == plain.count())
    val a = plain.select("k", "payload", "name").collect().map(_.toSeq).toSet
    val b = salted.select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("salted join spreads fully duplicate hot-key rows (multiset-correct)") {
    import spark.implicits._
    // every left row identical: a content-derived salt would put them all
    // in one bucket; the id-derived salt must both spread them and keep
    // join multiplicity (5000 result rows, not a dedup)
    val left = Seq.fill(5000)((7L, "same")).toDF("k", "payload")
    val right = Seq((7L, "dim7"), (8L, "dim8")).toDF("k", "name")
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", saltBuckets = 8)
    assert(salted.count() == 5000L)
    // reserved column name is enforced, not silently collided with
    intercept[IllegalArgumentException] {
      SkewJoin.saltedInnerJoin(left.withColumn("__salt", lit(1)), right, "k")
    }
  }

  test("merged-schema read: pre-drift files surface the new column as NULL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-drift-").toString
    // writer v1: (id, a); writer v2 adds column b — two footers, one lake
    Seq((1L, "x")).toDF("id", "a").write.parquet(s"$dir/p=1")
    Seq((2L, "y", 9L)).toDF("id", "a", "b").write.parquet(s"$dir/p=2")
    val got = graft.sources.Io.readParquetMergedSchema(spark, dir)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(got.toSeq == Seq((1L, "x", None), (2L, "y", Some(9L))),
      "old files must read the new column as NULL, not fail or drop it")
    Hygiene.release(spark)
  }
}
