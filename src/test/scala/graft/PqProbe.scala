package graft
object PqProbe {
  def main(args: Array[String]): Unit = {
    val s = TestSpark.spark
    import org.apache.spark.sql.functions._
    import graft.operators.{AnnPq, KMeans}
    graft.functions.VectorFunctions.register(s)
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding")).cache()
      val n = emb.count()
      val queries = emb.filter(col("vec_id") < 10)
      val model = AnnPq.fit(s, emb, 4, 16, 16, 1)
      // exact integer-L2 top-5 (e12's baseline)
      val fp = KMeans.fixedPoint(emb, "embedding").cache()
      val qFp = fp.filter(col("vec_id") < 10)
      val exactL2 = fp.as("e")
        .join(broadcast(qFp).as("q"), col("q.vec_id") =!= col("e.vec_id"))
        .select(col("q.vec_id").as("qid"), col("e.vec_id").as("vid"),
          expr("int_sqdist(q.x, e.x)").as("d2"))
      val exact = exactL2.groupBy("qid")
        .agg(graft.functions.TopKVids.topKVids(-col("d2").cast("double"), col("vid"), 5).as("top"))
        .select(col("qid"), explode(col("top.vids")).as("vid"))
        .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      for (sl <- Seq(50, 100, 200).filter(_ <= n)) {
        val approx = AnnPq.topK(s, emb, queries, model, k = 5, shortlist = sl)
          .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getAs[Long]("vid")).toSet).toMap
        val recalls = exact.map { case (q, t) => approx.get(q).map(a => (a & t).size.toDouble / t.size).getOrElse(0.0) }
        println(f"[pq] $d n=$n sl=$sl mean=${recalls.sum / recalls.size}%.2f min=${recalls.min}%.2f")
      }
      Hygiene.release(s)
    }
  }
}
