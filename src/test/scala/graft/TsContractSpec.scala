package graft

import org.apache.spark.sql.types.TimestampType

/** The events.ts physical-type contract (r8 post-mortem): the driver
  * regenerated testdata with `ts` stored as parquet TIMESTAMP without
  * UTC adjustment, Spark read it as TIMESTAMP_NTZ, and every
  * unix_micros/withWatermark consumer threw — silently DROPPING six
  * entries from the correctness gate because they failed before result
  * registration. This spec makes that failure mode loud in CI:
  *
  *  1. [[Tables.normalizeTs]] must map every physical form the data
  *     has shipped (ns-as-long, NTZ micros, adjusted micros) to
  *     session-TZ TimestampType;
  *  2. every ts-CONSUMING gate entry must run end-to-end on sf0.001
  *     and return rows — executed here precisely because a type drift
  *     throws at analysis/execution, not at compile time.
  */
class TsContractSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def available = new java.io.File(s"$sf/events.parquet").exists

  test("events.ts normalizes to session-TZ TimestampType") {
    assume(available)
    val df = Tables.tbl(spark, sf, "events")
    df.schema("ts").dataType shouldBe TimestampType
    // and the instants are usable: unix_micros is the call that threw
    // on NTZ (DATATYPE_MISMATCH), watermarks the other — covered below
    import org.apache.spark.sql.functions._
    df.select(unix_micros(col("ts"))).limit(1).collect().length shouldBe 1
  }

  // Every entry that reads events.ts through unix_micros, range
  // bucketing, or an event-time watermark — the exact set r8 lost.
  private val tsEntries = Seq(
    "j_range_bucketed", "w_sessionize", "st_session_custom",
    "st_stream_join_exec", "st_stream_session_exec",
    "st_stream_session_window")

  for (name <- tsEntries)
    test(s"$name survives the current events.ts physical type") {
      assume(available)
      val rows = SparkEntry.queries(name)(spark, sf).count()
      rows should be > 0L
    }
}
