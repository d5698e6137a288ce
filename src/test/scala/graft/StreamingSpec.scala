package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamFeatures
import graft.streaming.StreamFeatures.Event

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("streaming windowed counts with watermark match batch groupBy") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val agg = StreamFeatures.windowedCounts(input.toDF(), "ts", "url", "10 minutes", "5 minutes")
    val q = agg.writeStream.outputMode("complete").format("memory").queryName("wc").start()
    try {
      input.addData(
        Event("u1", ts("2024-01-01 00:01:00"), 1.0),
        Event("u1", ts("2024-01-01 00:05:00"), 2.0),
        Event("u1", ts("2024-01-01 00:15:00"), 3.0),
        Event("u2", ts("2024-01-01 00:02:00"), 5.0))
      q.processAllAvailable()
      val got = spark.sql("select url, n, sum_value from wc order by url, n desc")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got == Seq(("u1", 2L, 3.0), ("u1", 1L, 3.0), ("u2", 1L, 5.0)))
    } finally q.stop()
  }

  test("streaming sessionization closes a session after the gap and matches batch semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sess = StreamFeatures.sessionize(spark, input.toDS(), gapSeconds = 600)
    val q = sess.writeStream.outputMode("append").format("memory").queryName("sess").start()
    try {
      input.addData(
        Event("u1", ts("2024-01-01 00:00:00"), 1.0),
        Event("u1", ts("2024-01-01 00:05:00"), 2.0))
      q.processAllAvailable()
      // a later event far past the gap: closes session 1 in-flight
      input.addData(Event("u1", ts("2024-01-01 01:00:00"), 7.0))
      q.processAllAvailable()
      val got = spark.sql("select * from sess").as[StreamFeatures.SessionOut]
        .collect().sortBy(_.sessionStart.getTime)
      assert(got.length == 1)
      assert(got(0).nEvents == 2 && got(0).sumValue == 3.0)
      assert(got(0).sessionStart == ts("2024-01-01 00:00:00"))
      assert(got(0).sessionEnd == ts("2024-01-01 00:05:00"))
    } finally q.stop()
  }

  test("streaming curation gates + watermarked dedup match the batch pipeline's stateless stages") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamFeatures.Doc
    val en1 = "the quick brown fox jumps over the lazy dog and runs far away today"
    val pii = "please send the mail to bob@example.com and wait for the reply okay"
    val de1 = "der hund und die katze ist nicht ein freund von dem haus und der garten"
    val input = MemoryStream[Doc]
    val gated = StreamFeatures.curationGates(input.toDF(), "doc_id", "text")
    val dd = StreamFeatures.dedupExactStream(gated, "ts", "text", "10 minutes")
    val q = dd.writeStream.outputMode("append").format("memory").queryName("cur").start()
    try {
      input.addData(
        Doc(1L, ts("2024-01-01 00:00:00"), en1),
        Doc(2L, ts("2024-01-01 00:00:10"), de1),     // language gate drops
        Doc(3L, ts("2024-01-01 00:00:20"), "xyzzy"), // quality gate drops
        Doc(4L, ts("2024-01-01 00:00:30"), pii))
      q.processAllAvailable()
      input.addData(Doc(5L, ts("2024-01-01 00:01:00"), en1)) // dup of doc 1 within watermark
      q.processAllAvailable()
      val got = spark.sql("select * from cur").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Double]("quality"), r.getAs[String]("lang_pred"),
            r.getAs[String]("clean_text"), r.getAs[String]("split"))).toMap
      assert(got.keySet == Set(1L, 4L),
        "gates drop de/low-quality; watermarked dedup suppresses the duplicate")
      assert(got(4L)._3.contains("<EMAIL>") && !got(4L)._3.contains("bob@example.com"))
      assert(got(1L)._3 == en1, "clean text untouched by redaction")
      // parity by construction with the BATCH column gates: same expression
      // trees, so quality/lang/split agree exactly on the same rows
      val batch = Seq((1L, en1), (4L, pii)).toDF("doc_id", "text")
        .select(col("doc_id"),
          graft.text.TextFeatures.qualityScore(col("text")).as("q"),
          graft.text.TextFeatures.langId(col("text")).as("l"),
          graft.text.Sampling.splitByHash(col("doc_id"),
            Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)).as("s"))
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2), r.getString(3))).toMap
      Seq(1L, 4L).foreach { id =>
        assert(got(id)._1 == batch(id)._1 && got(id)._2 == batch(id)._2 &&
          got(id)._4 == batch(id)._3, s"doc $id streaming/batch gate drift")
      }
      // the streaming plan of the gates alone is stateless: no state store
      // operator — scales with source partitions only
      val gatesOnlyPlan = gated.queryExecution.analyzed.toString
      assert(!gatesOnlyPlan.toLowerCase.contains("statestore"))
    } finally q.stop()
  }

  test("streaming NB classifier gate: batch-trained model filters the stream map-side, batch parity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamFeatures.Doc
    // train OFFLINE on a labeled batch, deploy ONLINE as a stream gate —
    // the standard classifier-filter deployment
    val train = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today", true),
      (1L, "a well written clear paragraph about the weather today", true),
      (2L, "buy cheap pills now click here cheap spam offer", false),
      (3L, "click spam buy now cheap cheap pills", false)).toDF("id", "text", "pos")
    val m = graft.text.NbQuality.fit(train, "text", col("pos"), buckets = 64)
    val good = "the quick brown fox jumps over the lazy dog and walks home today again"
    val bad = "buy cheap pills now click here for the spam offer and the cheap pills again"
    val input = MemoryStream[Doc]
    val gated = StreamFeatures.curationGates(input.toDF(), "doc_id", "text",
      nbModel = Some(m), minLogOdds = 0.0)
    val q = gated.writeStream.outputMode("append").format("memory").queryName("nbgate").start()
    try {
      input.addData(
        Doc(1L, ts("2024-01-01 00:00:00"), good),
        Doc(2L, ts("2024-01-01 00:00:10"), bad))
      q.processAllAvailable()
      val got = spark.sql("select * from nbgate").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("nb_log_odds")).toMap
      assert(got.keySet == Set(1L), s"classifier gate keeps only the good doc, got $got")
      // exact parity with the batch scoring path (same fused expression)
      val batchScore = graft.text.NbQuality
        .score(Seq((1L, good)).toDF("doc_id", "text"), "doc_id", "text", m)
        .collect().head.getDouble(1)
      assert(got(1L) == batchScore, "streaming/batch classifier score drift")
      // still stateless: the weights ride in the expression, not in state
      assert(!gated.queryExecution.analyzed.toString.toLowerCase.contains("statestore"))
    } finally q.stop()
  }

  test("streaming chunking: chunkByTokens is stateless and matches batch on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamFeatures.Doc
    val long = (1 to 25).map(i => s"tok$i").mkString(" ")
    val input = MemoryStream[Doc]
    val chunked = graft.text.Packing.chunkByTokens(
      input.toDF().select(col("doc_id"), col("text")), "text", maxTokens = 10, overlap = 2)
    val q = chunked.writeStream.outputMode("append").format("memory")
      .queryName("chunks").start()
    try {
      input.addData(Doc(1L, ts("2024-01-01 00:00:00"), long),
        Doc(2L, ts("2024-01-01 00:00:01"), "short doc"))
      q.processAllAvailable()
      val got = spark.sql("select * from chunks").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3))).toMap
      val batch = graft.text.Packing.chunkByTokens(
        Seq((1L, long), (2L, "short doc")).toDF("doc_id", "text"), "text", 10, 2)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3))).toMap
      assert(got == batch, "streaming/batch chunk drift")
      assert(got.count(_._1._1 == 1L) == 3, "25 tokens at window 10 stride 8 = 3 chunks")
      assert(!chunked.queryExecution.analyzed.toString.toLowerCase.contains("statestore"))
    } finally q.stop()
  }

  test("streaming indexGate keeps exactly the batch indexMatches complement; stateless plan") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.text.Dedup
    val corpus = Seq(
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (4L, "colorless green ideas sleep furiously every single night in the lab"),
      (6L, "completely unrelated corpus text about volcanoes and tides and moons")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (103L, "colorless green ideas sleep furiously every single night in the lab"),
      (105L, "nothing like anything stored before pure novelty in every direction"),
      (107L, "too short")) // under n tokens: no signature, always kept
    val (n, k, bands, rpb, minAg) = (3, 8, 4, 2, 0.5)
    val indexSigs = Dedup.minHashSignatures(corpus, "doc_id", "text", n, k)
    val h = new graft.runtime.CacheHandle
    val input = MemoryStream[(Long, String)]
    val gated = StreamFeatures.indexGate(input.toDF().toDF("doc_id", "text"),
      indexSigs, "text", n, bands, rpb, minAg, handle = h)
    val q = gated.writeStream.outputMode("append").format("memory")
      .queryName("ig").start()
    try {
      input.addData(batch: _*)
      q.processAllAvailable()
      val kept = spark.sql("select doc_id from ig").collect().map(_.getLong(0)).toSet
      // batch truth: the indexMatches complement over the same batch
      val batchSigs = Dedup.minHashSignatures(batch.toDF("doc_id", "text"),
        "doc_id", "text", n, k)
      val matchedBatch = Dedup.indexMatches(batchSigs, indexSigs, "doc_id",
          bands, rpb, minAg, handle = h)
        .collect().map(_.getLong(0)).toSet
      assert(kept == batch.map(_._1).toSet -- matchedBatch,
        s"stream kept $kept, batch matched $matchedBatch")
      assert(kept == Set(105L, 107L), "near-dups gated, novel + short kept")
      // stateless: no state store operator anywhere in the gate's plan
      assert(!gated.queryExecution.analyzed.toString.toLowerCase.contains("statestore"))
      // hot-bucket guard aborts loudly on a degenerate index
      val hotIndex = Dedup.minHashSignatures(
        (0L until 10L).map(i => (i, "same boilerplate text repeated everywhere online"))
          .toDF("doc_id", "text"), "doc_id", "text", n, k)
      intercept[IllegalArgumentException] {
        StreamFeatures.indexGate(input.toDF().toDF("doc_id", "text"),
          hotIndex, "text", n, bands, rpb, minAg, maxBucket = 5, handle = h)
      }
    } finally { q.stop(); h.release() }
  }

  test("streaming exact dedup suppresses same-fingerprint rows within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // url doubles as the "text" whose md5 is the content fingerprint
    val dd = StreamFeatures.dedupExactStream(input.toDF(), "ts", "url", "10 minutes")
    val q = dd.writeStream.outputMode("append").format("memory").queryName("dd").start()
    try {
      input.addData(
        Event("same-text", ts("2024-01-01 00:00:00"), 1.0),
        Event("same-text", ts("2024-01-01 00:01:00"), 2.0), // dup within watermark
        Event("other-text", ts("2024-01-01 00:02:00"), 3.0))
      q.processAllAvailable()
      input.addData(Event("same-text", ts("2024-01-01 00:03:00"), 4.0)) // still a dup
      q.processAllAvailable()
      val got = spark.sql("select url, value from dd order by value")
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(got == Seq(("same-text", 1.0), ("other-text", 3.0)))
    } finally q.stop()
  }
}
