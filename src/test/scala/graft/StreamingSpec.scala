package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingOps

/** Structured Streaming execution of the StreamingOps transforms: a
  * MemoryStream drives the watermarked tumbling count incrementally,
  * proving the same plan fragment the batch oracle checks also runs
  * under readStream semantics (watermark, state, append mode). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked tumbling counts emit finalized windows; late row dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val out = StreamingOps.streamingTumblingCounts(
      mem.toDF().toDF("ts", "k"), "ts", "k", "1 hour", "30 minutes")

    val q = out.writeStream.format("memory").queryName("tumbling_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two events in hour 10, one in hour 11
      mem.addData((ts("2024-01-01 10:05:00"), "a"), (ts("2024-01-01 10:40:00"), "a"),
        (ts("2024-01-01 11:10:00"), "b"))
      q.processAllAvailable()
      // batch 2: event at 13:00 advances watermark to 12:30 -> hours 10,11 finalize
      mem.addData((ts("2024-01-01 13:00:00"), "b"))
      q.processAllAvailable()
      // batch 3: a LATE row for hour 10 (before watermark) must be dropped,
      // and 15:00 advances the watermark past hour 13
      mem.addData((ts("2024-01-01 10:20:00"), "a"), (ts("2024-01-01 15:00:00"), "c"))
      q.processAllAvailable()

      val rows = spark.table("tumbling_test")
        .select(date_format(col("window_start"), "HH").as("h"), col("k"), col("n"))
        .as[(String, String, Long)].collect().toSet
      rows should contain(("10", "a", 2L)) // late row did NOT bump this to 3
      rows should contain(("11", "b", 1L))
      rows should contain(("13", "b", 1L))
      rows should not contain (("10", "a", 3L))
      // hour 15 not finalized yet (watermark has not passed it) -> absent
      rows.map(_._1) should not contain "15"
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization: gap split + event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    import StreamingOps.{SessionEvent, SessionResult}
    val mem = MemoryStream[(Long, Timestamp)]
    val events = mem.toDF().toDF("userId", "eventTime")
      .withWatermark("eventTime", "0 seconds")
      .as[SessionEvent]
    val out = StreamingOps.sessionizeWithState(events, gapMs = 10 * 60 * 1000)

    val q = out.writeStream.format("memory").queryName("session_state_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two events 5 min apart (one session), then a 30-min gap
      mem.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      mem.addData((1L, ts("2024-01-01 10:35:00"))) // splits: first session closes
      q.processAllAvailable()
      // advance the watermark far past 10:45 so the open session times out
      mem.addData((2L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      mem.addData((2L, ts("2024-01-01 14:00:00"))) // push watermark past 12:10 too
      q.processAllAvailable()

      val rows = spark.table("session_state_test").as[SessionResult]
        .collect().map(r => (r.userId, r.startMs, r.endMs, r.n)).toSet
      def ms(s: String) = ts(s).getTime
      // user 1 session A: 10:00-10:05, closed by the 10:35 event, end = last+gap
      rows should contain((1L, ms("2024-01-01 10:00:00"), ms("2024-01-01 10:15:00"), 2L))
      // user 1 session B: the 10:35 singleton, closed by timeout
      rows should contain((1L, ms("2024-01-01 10:35:00"), ms("2024-01-01 10:45:00"), 1L))
      // user 2 first event: closed by timeout after the 14:00 event
      rows should contain((2L, ms("2024-01-01 12:00:00"), ms("2024-01-01 12:10:00"), 1L))
    } finally q.stop()
  }

  test("sessionization: out-of-order event across batches cannot shrink a session") {
    implicit val sqlCtx = spark.sqlContext
    import StreamingOps.{SessionEvent, SessionResult}
    val mem = MemoryStream[(Long, Timestamp)]
    val events = mem.toDF().toDF("userId", "eventTime")
      .withWatermark("eventTime", "30 minutes") // late-but-within-watermark arrivals
      .as[SessionEvent]
    val out = StreamingOps.sessionizeWithState(events, gapMs = 10 * 60 * 1000)
    val q = out.writeStream.format("memory").queryName("session_ooo_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, ts("2024-01-01 10:20:00")))
      q.processAllAvailable()
      // batch 2 delivers an OLDER event (within watermark): lastMs must
      // stay 10:20, so the 10:25 event still merges (10:25-10:20 < gap)
      mem.addData((1L, ts("2024-01-01 10:10:00")), (1L, ts("2024-01-01 10:25:00")))
      q.processAllAvailable()
      mem.addData((2L, ts("2024-01-01 14:00:00"))) // advance watermark, close it
      q.processAllAvailable()
      val rows = spark.table("session_ooo_test").as[SessionResult]
        .collect().filter(_.userId == 1L).map(r => (r.startMs, r.endMs, r.n)).toSet
      def ms(s: String) = ts(s).getTime
      // ONE session 10:10-10:35 with all 3 events — a regressed lastMs
      // would have split it into two
      rows shouldBe Set((ms("2024-01-01 10:10:00"), ms("2024-01-01 10:35:00"), 3L))
    } finally q.stop()
  }

  test("sessionizeBatch: gap split + trailing open session emitted (complete-history semantics)") {
    val events = Seq((1L, 0L), (1L, 50L), (1L, 200L), (2L, 10L)).toDS()
    val out = StreamingOps.sessionizeBatch(events, gapMicros = 100L)
      .collect().sortBy(r => (r.userId, r.startMs))
      .map(r => (r.userId, r.startMs, r.endMs, r.n)).toSeq
    // user 1: 0,50 merge (gap 50 < 100); 200 splits (150 >= 100); the
    // trailing session is emitted because a batch group is complete
    out shouldBe Seq((1L, 0L, 150L, 2L), (1L, 200L, 300L, 1L), (2L, 10L, 110L, 1L))
  }

  test("batch and streaming tumbling agree on the same input") {
    val batch = Seq(
      (ts("2024-01-01 10:05:00"), "a", 1.0), (ts("2024-01-01 10:40:00"), "a", 2.0),
      (ts("2024-01-01 11:10:00"), "b", 4.0)).toDF("ts", "k", "v")
    val got = StreamingOps.tumbling(batch, col("ts"), col("k"), col("v"), "1 hour")
      .select(date_format(col("window.start"), "HH").as("h"), col("k"), col("n"), col("sum_v"))
      .as[(String, String, Long, Double)].collect().toSet
    got shouldBe Set(("10", "a", 2L, 3.0), ("11", "b", 1L, 4.0))
  }
}
