package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Measurement-only harness (optimization rounds): run selected queries
  * with a stage-level listener and print, per query, where the wall time
  * goes — jobs, stages, task time, shuffle bytes, spill — plus the
  * formatted plan on request. Never invoked by the driver; exists so
  * optimization decisions are made from measurements instead of guesses
  * (spark_optimization_guide §1).
  *
  * Usage:
  *   sbt "runMain graft.Profile e02 d14"          — profile matching queries
  *   SPARK_GRAFT_PROFILE_PLANS=plans/r15 ...      — also dump explain() files
  */
object Profile {
  final case class StageRow(
      stageId: Int,
      name: String,
      tasks: Int,
      wallMs: Long,
      taskTimeMs: Long,
      shuffleReadB: Long,
      shuffleWriteB: Long,
      inputB: Long,
      spillB: Long
  )

  final class Listener extends SparkListener {
    val stages = mutable.ArrayBuffer.empty[StageRow]
    var jobs = 0
    override def onJobStart(jobStart: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val m = si.taskMetrics
      val wall = (for {
        s <- si.submissionTime; e <- si.completionTime
      } yield e - s).getOrElse(-1L)
      // first graft-owned frame in the callsite: the code line this stage
      // belongs to (the AQE future name alone is useless for attribution)
      val site = si.details.linesIterator
        .find(l => l.contains("graft.") && !l.contains("Profile"))
        .getOrElse("").trim.take(80)
      val extra = f"deser=${m.executorDeserializeTime} gc=${m.jvmGCTime} " +
        f"cpuMs=${m.executorCpuTime / 1000000} fetchWait=${m.shuffleReadMetrics.fetchWaitTime}"
      stages += StageRow(
        si.stageId,
        (extra + " @ " + site + " " + si.name.takeWhile(_ != '\n')).take(150),
        si.numTasks,
        wall,
        m.executorRunTime,
        m.shuffleReadMetrics.totalBytesRead,
        m.shuffleWriteMetrics.bytesWritten,
        m.inputMetrics.bytesRead,
        m.memoryBytesSpilled
      )
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val planDir = sys.env.get("SPARK_GRAFT_PROFILE_PLANS")
    val spark = GraftSession.builder("graft-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val selected =
      if (args.isEmpty) Seq.empty
      else SparkEntry.queries.toSeq.filter { case (n, _) => args.exists(n.contains) }.sortBy(_._1)
    require(selected.nonEmpty, "no matching queries; pass query-name substrings")
    // session warmup (classloading, scheduler)
    try SparkEntry.entry(spark).count()
    catch { case _: Throwable => () }
    for ((name, fn) <- selected) {
      // cold leg (uncached, compile included)
      def exec(): Unit = fn(spark, sfDir).queryExecution.toRdd.count()
      val t0 = System.nanoTime(); exec(); val cold = (System.nanoTime() - t0) / 1e9
      // warm leg under the listener — the steady-state leg the bench grades
      val l = new Listener
      spark.sparkContext.addSparkListener(l)
      val t1 = System.nanoTime(); exec(); val warm = (System.nanoTime() - t1) / 1e9
      spark.sparkContext.removeSparkListener(l)
      // drain listener bus before reading
      Thread.sleep(300)
      println(f"\n=== $name cold=$cold%.3f warm=$warm%.3f jobs=${l.jobs} stages=${l.stages.size} ===")
      val rows = l.stages.sortBy(-_.wallMs)
      val fmt = "%-6s %-5s %9s %10s %10s %10s %10s %10s  %s"
      println(fmt.format("stage", "tasks", "wallMs", "taskMs", "shRdKB", "shWrKB", "inKB", "spillKB", "name"))
      rows.take(20).foreach { s =>
        println(
          fmt.format(
            s.stageId.toString, s.tasks.toString, s.wallMs.toString, s.taskTimeMs.toString,
            (s.shuffleReadB / 1024).toString, (s.shuffleWriteB / 1024).toString,
            (s.inputB / 1024).toString, (s.spillB / 1024).toString, s.name))
      }
      println(f"total stage wall=${rows.map(_.wallMs).sum}ms taskTime=${rows.map(_.taskTimeMs).sum}ms")
      planDir.foreach { dir =>
        val p = java.nio.file.Paths.get(dir)
        java.nio.file.Files.createDirectories(p)
        java.nio.file.Files.write(
          p.resolve(s"${name}_profile_plan.txt"),
          fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
      }
      Hygiene.release(spark)
    }
    spark.stop()
  }
}
