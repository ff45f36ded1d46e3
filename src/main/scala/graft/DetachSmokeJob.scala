package graft

/** The executable half of docs/DETACH.md: a job packaged as a main so that
  * `spark-submit --deploy-mode cluster` hands ownership of the driver to
  * the cluster manager and the submitting process can exit (the
  * reference's detach=True layer 2 — the node service, not the client,
  * owns the job: `_remote_parallel_map.py:217-218`,
  * `job_watcher.py:259`).
  *
  * The job itself exercises layer 1 on top: `remoteParallelMapDetached`
  * submits the map on a daemon thread and the main blocks on the handle
  * — by the time results land, the shell that ran spark-submit is long
  * gone (each input sleeps, so the job provably outlives the submitter).
  * Results and the engine's own job ledger are persisted to the output
  * directory; the detached client re-attaches by reading THAT, exactly
  * as DETACH.md §3 prescribes. `tools/detach_smoke.sh` drives this
  * end-to-end against a throwaway standalone master/worker.
  */
object DetachSmokeJob {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: DetachSmokeJob <outDir> [nInputs] [sleepMsPerInput]")
    val out = args(0)
    val n = if (args.length > 1) args(1).toInt else 64
    val sleepMs = if (args.length > 2) args(2).toLong else 250L
    // submittedBuilder: master/deploy-mode belong to spark-submit here —
    // the local[32] builder would re-attach the driver to this JVM's
    // launcher and defeat the survival semantics under test
    val spark = GraftSession.submittedBuilder("graft-detach-smoke").getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")

    val job = Graft.remoteParallelMapDetached(spark, (1 to n).toList) { i =>
      Thread.sleep(sleepMs); i.toLong * i
    }
    val squares = job.result() // blocks on the detached handle

    import spark.implicits._
    Graft.writeParquet(
      (1 to n).map(_.toLong).zip(squares).toDF("input", "square"),
      s"$out/results.parquet"
    )
    // the dashboard tables, persisted past driver exit (DETACH.md §3)
    Graft.writeParquet(Graft.jobs(spark), s"$out/jobs.parquet")
    spark.stop()
  }
}
