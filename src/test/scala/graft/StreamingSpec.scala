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
