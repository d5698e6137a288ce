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
