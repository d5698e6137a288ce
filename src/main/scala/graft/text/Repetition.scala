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
  * Scale shape: ONE shuffle total, placed BEFORE the expensive work. The
  * raw (id, text) rows are hash-partitioned by document id (text ships
  * once — ~6× fewer bytes than shuffling the built gram instances, and
  * ~5× fewer than shuffling the gram-count table three times as the naive
  * groupBy→window→groupBy plan does). Everything downstream runs in that
  * partitioning with no further exchange, because partitioning by a
  * SUBSET of every later clustering key satisfies each required
  * distribution: token posexplode + window-`lead` gram construction
  * (id, pos), gram counting (id, n, gram), the top-gram window (id, n)
  * and the final per-document pivot (id). All gram construction is
  * whole-stage-codegen (`split`/`lead`/`concat_ws`/`stack`) — no
  * interpreted higher-order functions on the hot path (the HOF
  * `transform`+`slice` formulation measured ~25 µs per gram). The plan is
  * PlanSpec-pinned to exactly one exchange. Shuffle count is independent
  * of document length, n-gram order count, and corpus size; nothing is
  * collected to the driver.
  */
object Repetition {

  /** Per-document repetition metrics over whitespace words:
    *
    *  - `n_words`          — whitespace token count. NOTE: an empty or
    *                         whitespace-only document counts as ONE empty
    *                         token (raw `split` semantics, identical in the
    *                         DuckDB oracle) — unlike TextFeatures.tokenCount,
    *                         which special-cases empty text to 0
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
    val toks = df
      .select(col(id), col(textCol))
      // the one shuffle: cluster raw documents by id up front (see scaladoc)
      .repartition(col(id))
      .select(col(id), posexplode(TextFeatures.tokens(col(textCol))).as(Seq("pos", "tok")))

    val byPos = Window.partitionBy(col(id)).orderBy(col("pos"))
    val t1 = lead(col("tok"), 1).over(byPos)
    val t2 = lead(col("tok"), 2).over(byPos)
    val grams = toks
      .select(
        col(id),
        col("tok").as("g1"),
        // concat_ws SKIPS nulls — the explicit guards keep short tails null
        // instead of emitting truncated grams at the document end
        when(t1.isNotNull, concat_ws(" ", col("tok"), t1)).as("g2"),
        when(t2.isNotNull, concat_ws(" ", col("tok"), t1, t2)).as("g3")
      )
      .select(col(id), expr("stack(3, 1, g1, 2, g2, 3, g3)").as(Seq("n", "gram")))
      .where(col("gram").isNotNull)

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
