package graft
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("QB_REPS", "3").toInt
    val names = args.toSeq
    val spark = graft.core.GraftSession.get(32)
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (r <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      best(n) = math.min(best.getOrElse(n, Double.MaxValue), s)
      println(f"[qbench] rep$r $n $s%.2f s")
    }
    names.foreach(n => println(f"[qbench] MIN $n ${best(n)}%.2f s"))
    spark.stop()
  }
}
