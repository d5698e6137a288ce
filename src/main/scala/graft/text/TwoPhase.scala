package graft.text

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The shared scaffold of the engine's two-phase prefix sums
  * ([[Packing.packSequences]], [[Sampling.shuffleRank]]): exact global
  * offsets/ranks with NO global sort, by cumulating one tiny row per
  * ordering-bucket on the driver and broadcasting the bases back.
  */
private[text] object TwoPhase {

  /** One row (`__tp_bkt`, `__tp_base`) per occupied bucket, where base =
    * Σ weight over all LOWER buckets (bucket order = Long order). The
    * driver transfer is bounded BEFORE collection (`limit(maxBuckets+1)`),
    * aborting with a densify hint when exceeded — with sparse keys the
    * bucket table degenerates toward one row per input row, which must
    * never reach the driver. Null bucket keys abort (a null would silently
    * drop its rows at the join); null weights count as 0. */
  def prefixBases(df: DataFrame, bucket: Column, weight: Column, maxBuckets: Int): DataFrame = {
    require(maxBuckets >= 1, "maxBuckets must be >= 1")
    val spark = df.sparkSession
    val rows = df.groupBy(bucket.as("__tp_bkt"))
      .agg(sum(coalesce(weight, lit(0L))).as("__tp_w"))
      .limit(maxBuckets + 1)
      .collect()
    require(rows.length <= maxBuckets,
      s"over $maxBuckets occupied buckets would be cumulated on the driver — " +
        "the ordering keys look sparse; densify them first (e.g. Sampling.shuffleRank) " +
        "or raise the bucket size")
    val pairs = rows.map { r =>
      require(!r.isNullAt(0), "the ordering key column contains nulls")
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }.sortBy(_._1)
    var acc = 0L
    val bases = pairs.map { case (b, w) => val out = (b, acc); acc += w; out }
    spark.createDataFrame(
      spark.sparkContext.parallelize(bases.map(t => Row(t._1, t._2)).toSeq, 1),
      StructType(Seq(
        StructField("__tp_bkt", LongType),
        StructField("__tp_base", LongType))))
  }
}
