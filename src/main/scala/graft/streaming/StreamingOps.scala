package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.9 / §7.1-6: event-time window transforms, written once
  * and used from BOTH batch queries (the DuckDB-checkable surface) and
  * Structured Streaming (`readStream → transform → writeStream`) — the
  * transforms are plan fragments, so the same code runs incrementally
  * with watermark-driven state eviction.
  *
  * Scale notes: windowed counts/sums are partial-aggregated before the
  * shuffle on (window, key); session windows shuffle on the session key
  * (user) and merge per-key — the standard streaming-state layout. The
  * watermark bounds state size at 100 TB/day rates; without it a
  * streaming session/window agg would grow state unboundedly.
  */
object StreamingOps {

  /** Tumbling event-time windows: count + exact-decimal sum per
    * (window, key). */
  def tumbling(df: DataFrame, ts: Column, key: Column, value: Column,
      width: String): DataFrame =
    df.groupBy(window(ts, width), key)
      .agg(count(lit(1)).as("n"), graft.Tables.dsum(value).as("sum_v"))

  /** Sliding windows (width, slide): each event lands in width/slide
    * windows via the built-in window expansion. */
  def sliding(df: DataFrame, ts: Column, key: Column, value: Column,
      width: String, slide: String): DataFrame =
    df.groupBy(window(ts, width, slide), key)
      .agg(count(lit(1)).as("n"), graft.Tables.dsum(value).as("sum_v"))

  /** Session windows with a fixed inactivity gap, keyed per user. */
  def session(df: DataFrame, ts: Column, key: Column, gap: String): DataFrame =
    df.groupBy(session_window(ts, gap), key)
      .agg(count(lit(1)).as("n"))

  /** The streaming flagship: watermarked tumbling counts — the shape a
    * production pipeline runs 24/7. `readStream`-driven; late rows
    * beyond the watermark are dropped from state. */
  def streamingTumblingCounts(stream: DataFrame, tsCol: String, keyCol: String,
      width: String, watermark: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col(keyCol), col("n"))
}
