package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface for the same feature semantics as
  * [[graft.temporal.Windows]], for pipelines that ingest crawl events
  * incrementally instead of from a static table. Batch remains the primary
  * path (SURVEY §2.3: the north_rule is batch; late/duplicate revisits are
  * handled relationally), but the operators below make the engine usable as
  * `readStream → transform → writeStream`:
  *
  *  - [[windowedCounts]] — event-time tumbling-window counts/sums with a
  *    watermark bounding state.
  *  - [[sessionize]] — gap-based sessions via
  *    `flatMapGroupsWithState` with event-time timeout: a session closes
  *    when no event arrives within the gap; emits one row per closed
  *    session. State is O(open sessions).
  */
object StreamFeatures {

  final case class Event(url: String, ts: java.sql.Timestamp, value: Double)
  final case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)
  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class SessionOut(url: String, sessionStart: java.sql.Timestamp,
      sessionEnd: java.sql.Timestamp, nEvents: Long, sumValue: Double)

  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      windowDur: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))

  /** Streaming exact dedup on a content fingerprint: keeps the FIRST row per
    * md5(text) seen within the watermark horizon — the incremental analogue
    * of [[graft.text.Dedup.exact]]. State is bounded by the watermark
    * (duplicates arriving later than `watermark` after the original are not
    * suppressed — the relational batch dedup is the backstop, as with any
    * watermark-bounded streaming dedup). */
  def dedupExactStream(events: DataFrame, tsCol: String, textCol: String,
      watermark: String): DataFrame =
    events
      .withColumn("__fp", md5(encode(col(textCol), "UTF-8")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** The STATELESS curation gates of [[graft.SparkEntry]]'s
    * q_curation_pipeline, applied to a (possibly streaming) DataFrame:
    * quality score + language-ID filter, PII redaction, deterministic
    * hash-split assignment, optional stratified downsampling. Every gate is
    * pure Column logic — the SAME expression trees as the batch operators
    * ([[graft.text.TextFeatures]], [[graft.text.Sampling]]) — so a document
    * passes the streaming gate iff it passes the batch gate, by
    * construction, and the streaming plan stays fully map-side (no state, no
    * shuffle: a `readStream → curationGates → writeStream` pipeline scales
    * with source partitions alone). The one STATEFUL curation stage, exact
    * dedup, composes downstream via [[dedupExactStream]] (watermark-bounded
    * state); per-domain quotas and corpus shuffle are inherently
    * batch/global and stay on the batch path.
    *
    * Adds `quality`, `lang_pred`, `clean_text` (PII-redacted), `split`;
    * filters to `quality >= minQuality` and `lang_pred ∈ langs`, then (if
    * `sampleFractions` is non-empty) applies the per-language deterministic
    * downsampling filter. */
  def curationGates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minQuality: Double = 0.5,
      langs: Seq[String] = Seq("en"),
      sampleFractions: Map[String, Double] = Map.empty,
      splits: Seq[(String, Double)] = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
  ): DataFrame = {
    import graft.text.{Sampling, TextFeatures}
    val gated = docs
      .withColumn("quality", TextFeatures.qualityScore(col(textCol)))
      .withColumn("lang_pred", TextFeatures.langId(col(textCol)))
      .where(col("quality") >= minQuality &&
        col("lang_pred").isin(langs.map(_.asInstanceOf[Any]): _*))
      .withColumn("clean_text", TextFeatures.redactPii(col(textCol)))
      .withColumn("split", Sampling.splitByHash(col(idCol), splits))
    if (sampleFractions.isEmpty) gated
    else gated.where(
      Sampling.stratifiedSampleByHash(col(idCol), col("lang_pred"), sampleFractions))
  }

  def sessionize(spark: SparkSession, events: Dataset[Event], gapSeconds: Long): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.url)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (url: String, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(url,
              new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last), s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapSeconds * 1000 =>
                  cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed ::= SessionOut(url,
                    new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapSeconds * 1000)
            }
            closed.reverseIterator
          }
      }
  }
}
