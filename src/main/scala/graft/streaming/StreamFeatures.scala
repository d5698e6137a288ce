package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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
    * Adds `quality`, `lang_pred`, `clean_text` (PII-redacted), `split`
    * (and `nb_log_odds` when a classifier model is supplied); filters to
    * `quality >= minQuality`, `lang_pred ∈ langs`, and (when `nbModel` is
    * set) `nb_log_odds >= minLogOdds` — the batch-TRAINED model gates the
    * stream map-side, the weights riding inside the fused
    * [[graft.functions.BucketWeightSum]] expression (the standard
    * train-offline / filter-online classifier deployment). Then (if
    * `sampleFractions` is non-empty) applies the per-language deterministic
    * downsampling filter. */
  def curationGates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minQuality: Double = 0.5,
      langs: Seq[String] = Seq("en"),
      sampleFractions: Map[String, Double] = Map.empty,
      splits: Seq[(String, Double)] = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1),
      nbModel: Option[graft.text.NbQuality.Model] = None,
      minLogOdds: Double = 0.0
  ): DataFrame = {
    import graft.text.{NbQuality, Sampling, TextFeatures}
    val scored = docs
      .withColumn("quality", TextFeatures.qualityScore(col(textCol)))
      .withColumn("lang_pred", TextFeatures.langId(col(textCol)))
    val classified = nbModel.fold(scored)(m =>
      scored.withColumn("nb_log_odds", NbQuality.logOdds(col(textCol), m))
        .where(col("nb_log_odds") >= minLogOdds))
    val gated = classified
      .where(col("quality") >= minQuality &&
        col("lang_pred").isin(langs.map(_.asInstanceOf[Any]): _*))
      .withColumn("clean_text", TextFeatures.redactPii(col(textCol)))
      .withColumn("split", Sampling.splitByHash(col(idCol), splits))
    if (sampleFractions.isEmpty) gated
    else gated.where(
      Sampling.stratifiedSampleByHash(col(idCol), col("lang_pred"), sampleFractions))
  }

  /** Streaming incremental-dedup gate: filter an incoming document stream
    * to the docs that do NOT near-match a STATIC stored signature index —
    * the streaming face of [[graft.text.Dedup.indexMatches]] (the batch
    * operator stays the best-match reporter and periodic backstop). The
    * gate is STATELESS by construction, so it needs no watermark and emits
    * every kept row in its own microbatch:
    *
    *  - signatures are the pure per-row native expression
    *    ([[graft.functions.MinHashSignature]]) — map-side;
    *  - the index probe is `bands` stream-static left equi-joins of the
    *    per-band bucket value against ONE prepared static table
    *    ((band, bucket) → capped candidate signature list, built and
    *    cached once via `handle` — the `bands` re-references hit the
    *    cache, not the index);
    *  - the verify is the exact component-agreement rule of the batch
    *    operator, evaluated as an `exists` over the row's collected
    *    candidate lists (HOF over candidate-bounded arrays — near-dup
    *    candidates, not the corpus — the sanctioned small-array case).
    *
    * A doc is dropped iff ANY banding candidate's agreement reaches
    * `minAgreement` — the identical candidate set and verify rule as the
    * batch operator, so stream and batch keep the same documents. Docs
    * under `n` tokens have no signature and are always kept, matching the
    * batch convention (they never enter the signature table).
    *
    * `maxBucket` guards the prepared table against hot buckets (viral
    * boilerplate): the candidate lists ride along every probe row, so an
    * unbounded bucket would multiply stream bytes — the guard ABORTS
    * loudly (the Manku-lesson convention) rather than silently weakening
    * the gate. */
  def indexGate(
      docs: DataFrame,
      indexSigs: DataFrame,
      textCol: String,
      n: Int,
      bands: Int,
      rowsPerBand: Int,
      minAgreement: Double,
      maxBucket: Int = 100000,
      handle: graft.runtime.CacheHandle = new graft.runtime.CacheHandle
  ): DataFrame = {
    import graft.text.Dedup
    require(bands >= 1 && rowsPerBand >= 1, "bands and rowsPerBand must be positive")
    require(minAgreement >= 0 && minAgreement <= 1, "minAgreement must be in [0, 1]")
    require(maxBucket >= 1, "maxBucket must be >= 1")
    val k = bands * rowsPerBand
    def bucketOf(sig: Column, b: Int): Column =
      xxhash64(lit(b), concat_ws(",", slice(sig, b * rowsPerBand + 1, rowsPerBand)))
    val prepared = handle.track(
      indexSigs.select(col("sig"),
          posexplode(array((0 until bands).map(b => bucketOf(col("sig"), b)): _*))
            .as(Seq("band", "bucket")))
        .groupBy("band", "bucket")
        .agg(collect_list("sig").as("cands"), count(lit(1)).as("cnt"))
        .cache())
    val hotRow = prepared.agg(max("cnt")).head()
    val hot = if (hotRow.isNullAt(0)) 0L else hotRow.getLong(0)
    require(hot <= maxBucket,
      s"hottest index bucket holds $hot candidates (> maxBucket=$maxBucket) — " +
        "a hot boilerplate bucket would ride along every probe row; dedup the " +
        "index or raise the cap deliberately")
    val withSig = docs
      .withColumn("__sh", Dedup.shingles(col(textCol), n))
      .withColumn("__ig_sig", when(size(col("__sh")) > 0,
        graft.functions.MinHashSignature.signature(col("__sh"), k)))
      .drop("__sh")
    val probed = (0 until bands).foldLeft(withSig) { (d, b) =>
      d.withColumn(s"__bk$b", bucketOf(col("__ig_sig"), b))
        .join(prepared.where(col("band") === b)
          .select(col("bucket").as(s"__bk$b"), col("cands").as(s"__c$b")),
          Seq(s"__bk$b"), "left")
    }
    val empty = typedlit(Seq.empty[Seq[Long]])
    val allCands = concat((0 until bands).map(b =>
      coalesce(col(s"__c$b"), empty)): _*)
    val matched = exists(allCands, c =>
      size(filter(zip_with(col("__ig_sig"), c, (x, y) => x === y), v => v))
        / lit(k.toDouble) >= minAgreement)
    val dropCols = Seq("__ig_sig") ++
      (0 until bands).flatMap(b => Seq(s"__bk$b", s"__c$b"))
    probed
      .where(col("__ig_sig").isNull || !matched)
      .drop(dropCols: _*)
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
