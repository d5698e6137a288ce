package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, fully distributed synthesizer for the engine's primary
  * input shape (BASELINE.json input_hint):
  *   pages(url: string, warc_ts: timestamp, html: binary, text: string,
  *         lang: string)
  * plus a labels probe table (url, label_ts, label).
  *
  * Design constraints honored:
  *  - NO driver-side data: spark.range + hash-derived pseudo-randomness, so
  *    the same (nRows, seed) produces identical data at any parallelism and
  *    any scale — this is what the two-parallelism scaling bench runs on.
  *  - Zipf-ish skewed url popularity (a few hot urls) to exercise the skew
  *    path, via inverse-CDF u^alpha mapping of a uniform hash.
  *  - `text` is a PURE FUNCTION OF url — the byte-identity-per-url invariant
  *    (FIXTURES.md §1) holds by construction and is verified by hashing in
  *    the test suite; `html` wraps the text in deterministic markup bytes.
  *  - revisit gaps: crawl timestamps are spread over `days` with per-row
  *    hash offsets, giving multi-visit urls irregular gaps for
  *    sessionization.
  */
object PagesGen {

  private def u01(c: org.apache.spark.sql.Column, seed: Int): org.apache.spark.sql.Column =
    (pmod(xxhash64(c, lit(seed)), lit(1000000L)).cast("double") / 1000000.0)

  val baseEpoch: Long = 1700000000L // 2023-11-14T22:13:20Z

  def pages(spark: SparkSession, nRows: Long, nUrls: Long, seed: Int = 42, days: Int = 90): DataFrame = {
    val alpha = 3.0 // u^3: ~hottest url gets ~ (1 - (1-1/nUrls)^(1/3)) of traffic
    spark.range(nRows)
      .withColumn("__u", u01(col("id"), seed))
      .withColumn("urlId", floor(pow(col("__u"), alpha) * nUrls).cast("long"))
      .withColumn("url", concat(lit("https://site"), pmod(col("urlId"), lit(97L)),
        lit(".example/page/"), col("urlId")))
      .withColumn("offsetSec",
        (u01(col("id"), seed + 1) * days.toLong * 86400L).cast("long"))
      .withColumn("warc_ts", timestamp_seconds(lit(baseEpoch) + col("offsetSec")))
      .withColumn("lang",
        element_at(array(lit("en"), lit("en"), lit("en"), lit("de"), lit("fr"), lit("es")),
          (pmod(xxhash64(col("urlId"), lit(seed + 2)), lit(6L)) + 1).cast("int")))
      .withColumn("text",
        concat(lit("Extracted text of "), col("url"), lit(" token"),
          pmod(col("urlId"), lit(991L)), lit(" the quick brown fox jumps over the lazy dog. "),
          repeat(concat(lit("w"), pmod(col("urlId"), lit(13L)), lit(" ")), 8)))
      .withColumn("html",
        encode(concat(lit("<html><body>"), col("text"), lit("</body></html>")), "UTF-8"))
      .select("url", "warc_ts", "html", "text", "lang")
  }

  /** Probe side: one label per (url, ts) sample point; label is a
    * deterministic noisy function of url popularity so filter scores have
    * signal. String label ⇒ classification, double ⇒ regression. */
  def labels(spark: SparkSession, nRows: Long, nUrls: Long, seed: Int = 42, days: Int = 90): DataFrame = {
    val alpha = 3.0
    spark.range(nRows)
      .withColumn("__u", u01(col("id"), seed + 10))
      .withColumn("urlId", floor(pow(col("__u"), alpha) * nUrls).cast("long"))
      .withColumn("url", concat(lit("https://site"), pmod(col("urlId"), lit(97L)),
        lit(".example/page/"), col("urlId")))
      .withColumn("label_ts", timestamp_seconds(
        lit(baseEpoch) + (u01(col("id"), seed + 11) * days.toLong * 86400L).cast("long") + 3600L))
      .withColumn("label",
        (lit(1000.0) / (col("urlId") + 10) + u01(col("id"), seed + 12) * 2.0))
      .select("url", "label_ts", "label")
  }
}
