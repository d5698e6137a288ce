package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Word n-gram repetition metrics for webtext quality filtering — the
  * repetition family of filters from the public Gopher paper (Rae et al.
  * 2021, "Scaling Language Models", §A1.1) and C4: excessively repetitive
  * documents (boilerplate, SEO spam, scraper loops) are poor training data.
  * Reference colino has no text surface; this extends the LLM-pipeline
  * operator set next to [[TextFeatures.qualityScore]].
  *
  * Line-level variants (duplicate-line fraction) are deliberately omitted:
  * the metrics here are the word-n-gram family, which is well-defined on
  * any text; callers can split on newlines upstream and reuse the same
  * n=1 machinery per line if needed.
  *
  * Scale shape: ONE pass builds all (n, gram) instances for n = 1, 2, 3
  * inside a single generated-code `transform`/`flatten` (no per-n re-scan
  * of the corpus), then ONE shuffle total: the exploded instances are
  * hash-partitioned by document id once, and because partitioning by a
  * SUBSET of every downstream clustering key satisfies each required
  * distribution, the gram-count aggregation (id, n, gram), the top-gram
  * window (id, n) and the final per-document pivot (id) all run in that
  * same partitioning with no further exchange (PlanSpec-pinned). The
  * naive formulation shuffles the counts table three times. Shuffle count
  * is independent of document length, n-gram order count, and corpus
  * size; nothing is collected to the driver.
  */
object Repetition {

  private val gramType = "array<struct<n:int,gram:string>>"

  /** All word n-grams of one order as (n, gram) structs; empty array when
    * the document is too short (guarded — Spark's `sequence(1, 0)` would
    * otherwise DESCEND and fabricate grams). */
  private def gramsOfN(ws: Column, n: Int): Column =
    when(
      size(ws) >= n,
      transform(
        sequence(lit(1), size(ws) - (n - 1)),
        i => struct(lit(n).as("n"), array_join(slice(ws, i, lit(n)), " ").as("gram"))
      )
    ).otherwise(array().cast(gramType))

  /** Per-document repetition metrics over whitespace words:
    *
    *  - `n_words`          — whitespace token count (== TextFeatures.tokenCount)
    *  - `dup_word_frac`    — fraction of word instances beyond each word's
    *                         first occurrence: (instances − distinct) / instances
    *  - `top_2gram`        — most frequent word 2-gram; ties broken by the
    *                         lexicographically smallest gram (deterministic)
    *  - `top_2gram_frac`   — its share of all 2-gram instances
    *  - `dup_3gram_frac`   — fraction of 3-gram instances whose gram occurs
    *                         more than once in the document
    *
    * 2-/3-gram columns are null for documents with fewer than 2/3 words.
    * Fractions are exact rationals of counts — no float accumulation — so
    * they reproduce bit-for-bit cross-engine after 6 dp rounding.
    */
  def repetitionMetrics(df: DataFrame, id: String, textCol: String): DataFrame = {
    val ws = split(trim(col(textCol)), "\\s+")
    val grams = df.select(
      col(id),
      explode(flatten(array(gramsOfN(ws, 1), gramsOfN(ws, 2), gramsOfN(ws, 3)))).as("g")
    ).select(col(id), col("g.n").as("n"), col("g.gram").as("gram"))
      // one up-front shuffle on id alone serves all three downstream
      // clusterings (see scaladoc); AQE re-coalesces small partitions
      .repartition(col(id))

    val counts = grams.groupBy(col(id), col("n"), col("gram")).count()
    // (count, gram) is a total order within (id, n): gram is unique per group
    val byFreq = Window.partitionBy(col(id), col("n")).orderBy(col("count").desc, col("gram").asc)
    val ranked = counts.withColumn("rk", row_number().over(byFreq))

    def inst(n: Int): Column = sum(when(col("n") === n, col("count")))
    val perDoc = ranked
      .groupBy(col(id))
      .agg(
        inst(1).cast("long").as("w_inst"),
        count(when(col("n") === 1, col("gram"))).as("w_grams"),
        max(when(col("n") === 2 && col("rk") === 1, col("gram"))).as("top_2gram"),
        max(when(col("n") === 2 && col("rk") === 1, col("count"))).as("top2_cnt"),
        inst(2).as("g2_inst"),
        sum(when(col("n") === 3 && col("count") > 1, col("count"))).as("dup3_inst"),
        inst(3).as("g3_inst")
      )

    perDoc.select(
      col(id),
      col("w_inst").as("n_words"),
      round((col("w_inst") - col("w_grams")).cast("double") / col("w_inst"), 6)
        .as("dup_word_frac"),
      col("top_2gram"),
      round(col("top2_cnt").cast("double") / col("g2_inst"), 6).as("top_2gram_frac"),
      round(coalesce(col("dup3_inst"), lit(0L)).cast("double") / col("g3_inst"), 6)
        .as("dup_3gram_frac")
    )
  }
}
