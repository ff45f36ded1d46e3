package graft

/** Write `.explain("formatted")` for selected queries to files — the
  * optimization-round evidence artifact (plans/rNN/<query>_before.txt /
  * _after.txt). Usage:
  *   sbt "runMain graft.PlanDump plans/r15 before e02 d14 ..."
  * Arg 1: output dir; arg 2: suffix; rest: query-name substrings
  * (empty rest = every registered query).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [names...]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    java.nio.file.Files.createDirectories(outDir)
    val spark = GraftSession.builder("graft-plandump").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = args.drop(2)
    val selected =
      if (names.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
      else SparkEntry.queries.toSeq.filter { case (n, _) => names.exists(n.contains) }.sortBy(_._1)
    for ((name, fn) <- selected) {
      val txt =
        try fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"PLAN FAILED: $e" }
      java.nio.file.Files.write(
        outDir.resolve(s"${name}_$suffix.txt"), txt.getBytes("UTF-8"))
      println(s"wrote ${outDir.resolve(s"${name}_$suffix.txt")}")
      Hygiene.release(spark)
    }
    spark.stop()
  }
}
