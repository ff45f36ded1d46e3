package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole ScalaTest run. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession
      .builder("graft-test")
      .master("local[4]")
      // fast executor heartbeats so the live log relay spec can observe
      // mid-task accumulator delivery without multi-second waits (prod
      // default is 10s; the relay documents that knob)
      .config("spark.executor.heartbeatInterval", "250ms")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}
