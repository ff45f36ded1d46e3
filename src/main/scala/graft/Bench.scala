package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every registered query against
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints one JSON line.
  *
  * Each query executes twice and reports the faster run: the first
  * execution of a query pays Catalyst planning + whole-stage-codegen
  * Janino compilation (seconds for the wide dedup pipelines), which on a
  * long-lived cluster amortizes to zero — steady-state is the engine
  * number. The cold aggregate is still reported as "cold_value" for
  * honesty. Queries are forced with .count() (full plan execution, no
  * driver-side result materialization in the timing).
  *
  * Output budget: the round driver captures only the LAST 2000 chars of
  * stdout, and full query names (~25 chars/entry x 80+ queries) overflow
  * that, truncating the head of the map (r3/r4 lost d01-d10). The stdout
  * map is therefore keyed by each query's unique id prefix ("q01", "d05",
  * "e10" — the token before the first underscore), which keeps the whole
  * line around 1 KB at any realistic query count. The full-name table
  * (warm + cold, 3 decimals) is written to bench_full.json in the working
  * directory; BASELINE.md carries the committed per-query reference table.
  */
object Bench {
  /** Locale-fixed decimal rendering for the JSON outputs: the f""
    * interpolator uses the JVM default locale, so a de_DE/fr_FR driver
    * would emit comma decimal separators — invalid JSON the round driver
    * (and any consumer) fails to parse. */
  private[graft] def jnum(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session once on the smallest tier (classloading, first-job
    // scheduler setup) so even "cold" numbers measure the engine.
    try SparkEntry.entry(spark).count()
    catch { case _: Throwable => () }
    // Force the query's OWN physical plan (toRdd), not count() over it:
    // an Aggregate(count) on top lets Catalyst prune every projection and
    // eliminate sorts, which would time a bare parquet scan for
    // projection-only queries. A failed query reports -1, never a timing.
    def time(fn: => Unit): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { fn; true }
        catch { case _: Throwable => false }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    // Optional args: query names to bench (substring match) — iterate on one
    // hot query without paying the full suite.
    val selected =
      if (args.isEmpty) SparkEntry.queries.toSeq
      else SparkEntry.queries.toSeq.filter { case (n, _) => args.exists(n.contains) }
    val results = selected.sortBy(_._1).map { case (name, fn) =>
      def exec(): Unit = fn(spark, sfDir).queryExecution.toRdd.count()
      val (cold, okC) = time(exec())
      val (warm, okW) = time(exec())
      // Drop cached intermediates (the dedup/ANN family caches signature
      // and candidate frames) so a query's leftovers don't evict/GC-churn
      // the queries benched after it — measured: q27/q28 read 3.3 s in the
      // full suite vs 1.3/1.2 s isolated before this, identical after.
      // Clearing sits OUTSIDE the timed region; within-query cache
      // materialization still pays inside its own number.
      spark.sqlContext.clearCache()
      // clearCache only empties the SQL CacheManager; localCheckpoint
      // blocks (KMeans.fitAssign's label frames in e09/e14/d10) live as
      // plain persisted RDDs until the driver GCs them — release them
      // explicitly. Safe here: queries are independent, and a dead
      // checkpoint's frame is never re-read.
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      if (okC && okW) (name, math.min(cold, warm), cold, true)
      else (name, -1.0, -1.0, false)
    }
    val qs = results
      .map { case (k, v, _, _) => "\"" + k.takeWhile(_ != '_') + "\":" + jnum(v) }
      .mkString("{", ",", "}")
    val ok = results.filter(_._4)
    val total = ok.map(_._2).sum
    val coldTotal = ok.map(_._3).sum
    val failed = results.count(!_._4)
    // Full-name detail artifact (not size-constrained): warm + cold per
    // query. ONLY full-suite runs may write it — a subset run (`Bench d13
    // d14`) would otherwise clobber the tracked 85-query record with a
    // 2-query file that reads as a clean full run (and the round snapshot
    // commits the tree wholesale).
    if (args.isEmpty) {
      val detail = results
        .map { case (k, v, c, o) =>
          s"""  "$k": {"warm": ${jnum(v)}, "cold": ${jnum(c)}, "ok": $o}"""
        }
        .mkString("{\n", ",\n", "\n}")
      val detailPath = java.nio.file.Paths.get("bench_full.json")
      java.nio.file.Files.write(
        detailPath,
        s"""{"sf": "$sfDir", "warm_total": ${jnum(total)}, "cold_total": ${jnum(coldTotal)}, "failed": $failed, "queries": $detail}"""
          .getBytes("UTF-8")
      )
    }
    println(
      s"""{"metric":"total","value":${jnum(total)},"unit":"sec","queries":$qs,"cold_value":${jnum(coldTotal)},"failed":$failed,"sf":"$sfDir"}"""
    )
    spark.stop()
  }
}
