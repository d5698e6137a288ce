package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over the corpus — the engine's keyword-search
  * capability (used in curation for seed-term domain harvesting and for
  * eyeballing what a filter kept). Okapi BM25 with the standard
  * Robertson idf = ln((N − df + 0.5)/(df + 0.5) + 1), k1/b defaults
  * 1.2/0.75.
  *
  * Scale shape (the posting-list join, relationally): tokens explode
  * per document but are filtered to the QUERY'S terms inside the same
  * projection (`isin` — a broadcast-sized set), so only matching
  * (doc, term) pairs ever shuffle: one map-side-combining groupBy for
  * tf, a |query|-row docfreq aggregate broadcast back, one 1-row
  * (N, avgdl) aggregate broadcast via the sanctioned 1-row crossJoin,
  * and top-k by TakeOrderedAndProject — no global sort, no full posting
  * list materialized. Per-row cost is O(tokens); shuffle volume is
  * O(matches), independent of corpus width.
  *
  * Tokenization is the corpus convention shared with
  * [[TextFeatures.tokenCount]]'s oracle replay: lowercase, trim,
  * whitespace split, empty text ⇒ no tokens — byte-reproducible in any
  * engine (the DuckDB oracle replays it verbatim).
  */
object Bm25 {

  /** Whitespace tokens of `text`, lowercased; empty/blank → empty array;
    * null propagates. */
  def tokens(text: Column): Column =
    when(text.isNull, lit(null).cast("array<string>"))
      .when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(lower(trim(text)), "\\s+"))

  /** Top-k documents by BM25 score for `query` terms (deduplicated;
    * multiplicity in the query does not re-weight a term — the standard
    * bag-of-terms-once convention). Returns (id, score) for documents
    * matching ≥ 1 term, ordered (score desc, id), limit k. */
  def bm25TopK(
      df: DataFrame,
      id: String,
      text: String,
      query: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      handle: graft.runtime.CacheHandle = new graft.runtime.CacheHandle
  ): DataFrame = {
    require(query.nonEmpty, "bm25 needs at least one query term")
    require(k >= 1, "top-k size must be >= 1")
    val terms = query.map(_.toLowerCase).distinct
    // tokenized base CACHED (handle default = session-LRU, the registered-
    // query convention) and fanned: it is referenced by three subtrees
    // (corpus stats, tf, and tf again inside the docfreq broadcast), each
    // a separate job that re-ran the whole tokenize chain on the source's
    // input splits (measured: three 0.15-0.25 s single-task stages at
    // bench SF — ~90% of the query)
    val base = handle.track(
      graft.core.Partitions.fanOut(df.select(col(id), col(text)))
        .select(col(id), tokens(col(text)).as("__toks"))
        .where(col("__toks").isNotNull)
        .withColumn("__dl", size(col("__toks")))
        .cache())
    // 1-row corpus stats, broadcast (the sanctioned 1-row crossJoin)
    val stats = base.agg(
      count(lit(1)).as("__n"), avg(col("__dl").cast("double")).as("__avgdl"))
    // only the query's terms survive the projection — shuffle is O(matches)
    val tf = base
      .select(col(id), col("__dl"), explode(col("__toks")).as("__term"))
      .where(col("__term").isin(terms: _*))
      .groupBy(col(id), col("__term"), col("__dl"))
      .agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy("__term").agg(count(lit(1)).as("__dft"))
    tf
      .join(broadcast(dfreq), Seq("__term"))
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log((col("__n") - col("__dft") + 0.5) / (col("__dft") + 0.5) + 1.0))
      .withColumn("__s",
        col("__idf") * col("__tf") * lit(k1 + 1.0) /
          (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
      .groupBy(col(id))
      .agg(sum(col("__s")).as("score"))
      .orderBy(col("score").desc, col(id))
      .limit(k)
  }
}
