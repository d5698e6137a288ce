package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table layout for the pages corpus — the Iceberg layout from SURVEY §1.4
  * (`partitioned by days(warc_ts), bucketed by url`) expressed on plain
  * parquet, which is what this sandbox ships (no Iceberg jar): a `dt` day
  * partition column + optional url-hash bucket column. On a real deployment
  * the same calls switch to `df.writeTo(table).partitionedBy(days($"warc_ts"),
  * bucket(N, $"url"))` with no other code change — every reader below goes
  * through time predicates that prune partitions either way.
  */
object Store {

  /** Write pages partitioned by crawl day (and optionally url buckets).
    * Day partitioning makes label-time predicates prune whole directories;
    * bucketing co-locates a url's revisits for the as-of/window exchange. */
  def writePages(df: DataFrame, path: String, urlBuckets: Int = 0): Unit = {
    val withDt = df.withColumn("dt", to_date(col("warc_ts")))
    val (out, cols) =
      if (urlBuckets > 0)
        (withDt.withColumn("ub", pmod(xxhash64(col("url")), lit(urlBuckets))), Seq("dt", "ub"))
      else (withDt, Seq("dt"))
    out.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)
  }

  def readPages(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Time-bounded scan: the `dt` predicate prunes day partitions at
    * planning time (no file listing for excluded days), the `warc_ts`
    * predicate is pushed to parquet row groups. Use for every
    * "features as of T" computation — nothing after maxTs is even read,
    * which also makes temporal leakage structurally impossible at the scan.
    */
  def pagesUpTo(spark: SparkSession, path: String, maxTs: java.sql.Timestamp): DataFrame =
    readPages(spark, path)
      .where(col("dt") <= to_date(lit(maxTs)) && col("warc_ts") <= lit(maxTs))

  /** Feature-vector sink with lineage: writes the data partitioned by label
    * day plus a `_metrics` JSON table of per-partition row counts/digests
    * (north_rule: metrics alongside outputs). */
  def writeFeatures(df: DataFrame, path: String, labelTs: String = "label_ts"): Unit = {
    val withDt = df.withColumn("dt", to_date(col(labelTs)))
    withDt.write.mode(SaveMode.Overwrite).partitionBy("dt").parquet(path)
    graft.runtime.Lineage.writeMetrics(
      graft.runtime.Lineage.partitionMetrics(withDt, Seq(labelTs)), path + "_metrics")
  }
}
