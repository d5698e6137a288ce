package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the standard pretraining step that concatenates
  * documents in a fixed order and chunks the stream into training sequences
  * of `budget` tokens (documents may straddle chunk boundaries; the
  * tokenizer's EOS handling is the caller's token count). The engine's job
  * is the exact GLOBAL token offset of every document, deterministically,
  * without a global sort.
  *
  * Scale shape (the repo's two-phase prefix-sum pattern): documents are
  * range-bucketed by the ordering key (`id / bucketSize` — contiguous id
  * ranges, so bucket order IS document order); per-bucket token sums (one
  * row per bucket) are cumulated driver-side and broadcast back as bucket
  * base offsets; the within-bucket running sum is a windowed cumsum
  * partitioned by bucket (parallel, bounded partitions). No single-partition
  * window anywhere; every stage is deterministic at any parallelism.
  */
object Packing {

  /** Global packing offsets for each document, ordered by `id` (which must
    * be unique and non-negative). Returns the input columns plus:
    * `global_start` (tokens before this doc), `first_seq`/`last_seq` (the
    * chunk ids this doc lands in, budget-token chunks of the concatenated
    * stream). Zero-token docs occupy no chunk: their `first_seq`/`last_seq`
    * are null. */
  def packSequences(
      df: DataFrame,
      id: String,
      tokensCol: String,
      budget: Long,
      bucketSize: Long = 4096L
  ): DataFrame = {
    require(budget >= 1, "budget must be >= 1 token")
    require(bucketSize >= 1, "bucketSize must be >= 1")
    val spark = df.sparkSession
    val bucketed = df.withColumn("__pbkt", floor(col(id) / bucketSize))
    // phase 1: one tiny row per bucket -> exact driver-side prefix sum.
    // The driver holds one row per OCCUPIED bucket: with dense ids that is
    // ~n/bucketSize; with SPARSE ids (random 64-bit keys) it degenerates
    // toward one bucket per row and the collect becomes the corpus — guard
    // it. Densify sparse keys first (Sampling.shuffleRank emits exactly the
    // dense, shuffled ordering a packing pass wants) or raise bucketSize.
    val maxBuckets = 1 << 22
    // limit bounds the driver transfer itself (<= ~64 MB) before the check;
    // when the true bucket count is within the limit, limit() returns ALL
    val sums = bucketed.groupBy("__pbkt")
      .agg(sum(col(tokensCol)).as("__btoks"))
      .limit(maxBuckets + 1)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(_._1)
    require(sums.length <= maxBuckets,
      s"over $maxBuckets occupied id-buckets would be cumulated on the driver — " +
        "ids look sparse; densify them first (e.g. Sampling.shuffleRank) or raise bucketSize")
    var acc = 0L
    val bases = sums.map { case (b, t) => val base = (b, acc); acc += t; base }
    val baseDf = spark.createDataFrame(
      spark.sparkContext.parallelize(bases.map(t => org.apache.spark.sql.Row(t._1, t._2)).toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__pbkt", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("__base", org.apache.spark.sql.types.LongType))))
    // phase 2: parallel within-bucket cumsum + broadcast base offset
    val w = Window.partitionBy("__pbkt").orderBy(col(id))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .join(broadcast(baseDf), "__pbkt")
      .withColumn("global_start",
        col("__base") + coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("first_seq",
        when(col(tokensCol) > 0, floor(col("global_start") / budget)))
      .withColumn("last_seq",
        when(col(tokensCol) > 0,
          floor((col("global_start") + col(tokensCol) - 1) / budget)))
      .drop("__pbkt", "__base")
  }
}
