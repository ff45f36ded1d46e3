package graft
/** Prints formatted physical plans for the headline queries — the
  * scale-review tool: check pushed filters, pruned schemas, join
  * strategies, and shuffle counts.  Usage: runMain graft.Plans [names...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("graft-plans").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q03_shipping_priority", "q06_revenue_forecast",
               "q23_asof_last_order", "q27_brand_revenue", "d02_dedup_minhash_lsh")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
