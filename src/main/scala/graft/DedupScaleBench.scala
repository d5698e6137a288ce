package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scale probe for the TEXT dedup path (records feed BASELINE.md):
  * the full candidate-then-verify near-duplicate chain —
  * native-codegen MinHash signatures → LSH band join → array_intersect
  * exact Jaccard verify ([[graft.text.Dedup.nearDuplicates]]) — over a
  * deterministically synthesized corpus with planted near-duplicates
  * (every 100th document shares ~90 % of the previous plant's tokens, so
  * the banding has real work), interleaved at local[8]/local[32], min per
  * level. This is the north-rule two-parallelism evidence for the corpus
  * path, complementing the feature-pipeline probe in [[Bench]] and the
  * ALU-bound kmeans/sign-LSH probes.
  *
  * Env knobs: DD_ROWS (default 300000), DD_TOKENS (60), DD_PAIRS (3). */
object DedupScaleBench {

  /** Deterministic synthetic corpus: base docs draw `tokens` hash-random
    * words; every 100th doc copies the IMMEDIATELY PRECEDING doc's tokens
    * except the last 6 (~90 % token overlap ⇒ shingle Jaccard ≳ 0.8), so
    * the banding join has rows-proportional real work (one planted
    * near-dup pair per 100 docs). */
  private def corpus(spark: SparkSession, rows: Long, tokens: Int): DataFrame = {
    val isDup = col("id") % 100L === 0L && col("id") >= 100L
    val seedId = when(isDup, col("id") - 1L).otherwise(col("id"))
    val toks = (0 until tokens).map { j =>
      val src = if (j >= tokens - 6) col("id") else seedId
      concat(lit("w"), pmod(xxhash64(src, lit(j)), lit(4096L)).cast("string"))
    }
    spark.range(rows).repartition(64, col("id"))
      .select(col("id"), concat_ws(" ", toks: _*).as("text"))
  }

  private def timeOnce(cores: Int, rows: Long, tokens: Int): (Long, Double) = {
    val spark = graft.core.GraftSession.get(cores)
    try {
      val df = corpus(spark, rows, tokens).cache()
      df.count()
      def run(d: DataFrame): Long =
        graft.text.Dedup.nearDuplicates(d, "id", "text",
          n = 3, minJaccard = 0.8, signatures = 32, bands = 16).count()
      run(df.limit((rows / 16).toInt)) // JIT/codegen warm-up
      val t0 = System.nanoTime()
      val pairs = run(df)
      val sec = (System.nanoTime() - t0) / 1e9
      df.unpersist()
      (pairs, sec)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("DD_ROWS", "300000").toLong
    val tokens = sys.env.getOrElse("DD_TOKENS", "60").toInt
    val pairs = sys.env.getOrElse("DD_PAIRS", "3").toInt
    val t8s = scala.collection.mutable.ArrayBuffer.empty[Double]
    val t32s = scala.collection.mutable.ArrayBuffer.empty[Double]
    var found = 0L
    for (p <- 1 to pairs) {
      val (f8, a) = timeOnce(8, rows, tokens)
      val (f32, b) = timeOnce(32, rows, tokens)
      require(f8 == f32, s"pair count must be parallelism-invariant: $f8 != $f32")
      found = f32
      t8s += a; t32s += b
      println(f"[ddscale] pair$p sec8=$a%.2f sec32=$b%.2f pairs=$found")
    }
    val sec8 = t8s.min; val sec32 = t32s.min
    val speedup = math.min(4.0, sec8 / sec32)
    println(f"""{"rows":$rows,"tokens":$tokens,"nearDupPairs":$found,"sec8":$sec8%.2f,""" +
      f""""sec32":$sec32%.2f,"rps32":${rows / sec32}%.0f,"speedup":$speedup%.2f,""" +
      f""""efficiency":${speedup / 4.0}%.3f}""")
  }
}
