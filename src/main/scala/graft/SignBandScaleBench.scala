package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sim.Similarity

/** Dev scale probe for the fused sign-LSH band-signature path (records feed
  * the BASELINE.md round-5 runs): the banded signature projection of
  * [[Similarity.cosineNearDupPairs]] — (id, band, sig) via posexplode —
  * materialized over a deterministically synthesized corpus, comparing
  *
  *  - `native`: [[graft.functions.SignBandSignatures]] (all bands in one
  *    codegen loop over the flat plane matrix), and
  *  - `chain`: the compositional per-plane when/shiftleft construction
  *    (`Similarity.bandSigsBuiltin`) — at the production 32×8 sizing its
  *    generated consume method exceeds the JVM 64 KB limit, so the WHOLE
  *    stage runs interpreted (the failure q_cosine_neardup shipped with
  *    until round 5),
  *
  * interleaved, min per variant (the shared-host convention). Also times
  * the native path at local[8] for the thread-scaling datum — 256 plane
  * dots × 64 dims = 16k flops/row, ALU-bound like the kmeans probe.
  *
  * Env knobs: SB_ROWS (default 200000), SB_PLANES (256), SB_BANDS (32),
  * SB_DIM (64), SB_PAIRS (3). */
object SignBandScaleBench {

  private def corpus(spark: SparkSession, rows: Long, dim: Int): DataFrame = {
    val dims = (0 until dim).map { i =>
      (pmod(xxhash64(col("id"), lit(i)), lit(1048576L)).cast("double") / 1048576.0 - 0.5)
        .cast("float")
    }
    spark.range(rows).repartition(64, col("id")).select(col("id"), array(dims: _*).as("v"))
  }

  private def timeOnce(cores: Int, rows: Long, dim: Int,
      planes: Array[Array[Double]], bands: Int, native: Boolean): Double = {
    val spark = graft.core.GraftSession.get(cores)
    try {
      val df = corpus(spark, rows, dim).cache()
      df.count()
      def banded(d: DataFrame): DataFrame = {
        val sigs =
          if (native) graft.functions.ArrayMath.signBandSigs(col("v"), planes, bands)
          else Similarity.bandSigsBuiltin(col("v"), planes, bands)
        d.select(col("id"), posexplode(sigs).as(Seq("band", "sig")))
      }
      banded(df.limit((rows / 16).toInt)).count() // JIT/codegen warm-up
      val t0 = System.nanoTime()
      banded(df).count()
      val sec = (System.nanoTime() - t0) / 1e9
      df.unpersist()
      sec
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SB_ROWS", "200000").toLong
    val nPlanes = sys.env.getOrElse("SB_PLANES", "256").toInt
    val bands = sys.env.getOrElse("SB_BANDS", "32").toInt
    val dim = sys.env.getOrElse("SB_DIM", "64").toInt
    val pairs = sys.env.getOrElse("SB_PAIRS", "3").toInt
    val planes = Similarity.hyperplanes(nPlanes, dim)
    val nat32 = scala.collection.mutable.ArrayBuffer.empty[Double]
    val nat8 = scala.collection.mutable.ArrayBuffer.empty[Double]
    val chain32 = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (p <- 1 to pairs) {
      val a = timeOnce(32, rows, dim, planes, bands, native = true)
      val b = timeOnce(32, rows, dim, planes, bands, native = false)
      val c = timeOnce(8, rows, dim, planes, bands, native = true)
      nat32 += a; chain32 += b; nat8 += c
      println(f"[sbscale] pair$p native32=$a%.2f chain32=$b%.2f native8=$c%.2f")
    }
    val n32 = nat32.min; val c32 = chain32.min; val n8 = nat8.min
    val speedup = math.min(4.0, n8 / n32)
    println(f"""{"rows":$rows,"planes":$nPlanes,"bands":$bands,"dim":$dim,""" +
      f""""native32":$n32%.2f,"chain32":$c32%.2f,"chainOverNative":${c32 / n32}%.1f,""" +
      f""""native8":$n8%.2f,"rps32":${rows / n32}%.0f,"threadSpeedup":$speedup%.2f}""")
  }
}
