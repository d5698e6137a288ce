package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sim.Similarity

/** Dev scale probe for the fused centroid-assignment path (records feed the
  * BASELINE.md round-5 kmeans runs): ONE Lloyd iteration — fused
  * [[graft.functions.NearestCentroid]] assignment + (cell, dim) exact
  * fixed-point stats + k·d collect — over a deterministically synthesized
  * corpus, interleaved at local[8] and local[32], min per level (the
  * shared-host convention from Bench: steal only inflates timings).
  * k·d multiply-adds per row dominate (k=256 × d=64 ⇒ 16k flops/row), so
  * this isolates the new expression's thread scaling from shuffle/scan
  * noise — it should track the ALU burn, not the DRAM ceiling.
  *
  * Env knobs: KM_ROWS (default 600000), KM_K (256), KM_DIM (64),
  * KM_PAIRS (3 interleaved pairs). */
object KmeansScaleBench {

  /** Deterministic synthetic corpus: dim pseudo-random floats in [-0.5, 0.5)
    * per row, derived from xxhash64(id, dim) — identical at any parallelism
    * and in any session. */
  private def corpus(spark: SparkSession, rows: Long, dim: Int): DataFrame = {
    val dims = (0 until dim).map { i =>
      (pmod(xxhash64(col("id"), lit(i)), lit(1048576L)).cast("double") / 1048576.0 - 0.5)
        .cast("float")
    }
    spark.range(rows).repartition(64, col("id")).select(col("id"), array(dims: _*).as("v"))
  }

  private def timeOnce(cores: Int, rows: Long, k: Int, dim: Int): Double = {
    val spark = graft.core.GraftSession.get(cores)
    try {
      // materialize the synthetic corpus BEFORE timing — the probe measures
      // the kmeans iteration (assignment + stats), not 64 hash calls per row
      val df = corpus(spark, rows, dim).cache()
      df.count()
      val seed = df.where(col("id") < k).orderBy("id")
        .collect().map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
      Similarity.kmeans(df.limit((rows / 16).toInt), "v", seed, iters = 1) // JIT/codegen warm-up
      val t0 = System.nanoTime()
      Similarity.kmeans(df, "v", seed, iters = 1)
      val sec = (System.nanoTime() - t0) / 1e9
      df.unpersist()
      sec
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("KM_ROWS", "600000").toLong
    val k = sys.env.getOrElse("KM_K", "256").toInt
    val dim = sys.env.getOrElse("KM_DIM", "64").toInt
    val pairs = sys.env.getOrElse("KM_PAIRS", "3").toInt
    val t8s = scala.collection.mutable.ArrayBuffer.empty[Double]
    val t32s = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (p <- 1 to pairs) {
      val a = timeOnce(8, rows, k, dim)
      val b = timeOnce(32, rows, k, dim)
      t8s += a; t32s += b
      println(f"[kmscale] pair$p sec8=$a%.2f sec32=$b%.2f")
    }
    val sec8 = t8s.min; val sec32 = t32s.min
    val speedup = math.min(4.0, sec8 / sec32)
    println(f"""{"rows":$rows,"k":$k,"dim":$dim,"sec8":$sec8%.2f,"sec32":$sec32%.2f,""" +
      f""""rps32":${rows / sec32}%.0f,"speedup":$speedup%.2f,"efficiency":${speedup / 4.0}%.3f}""")
  }
}
