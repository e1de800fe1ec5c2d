package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet table access + oracle-determinism helpers.
  *
  * Scale notes (100 TB design intent):
  *  - Readers return lazy DataFrames; column pruning / predicate pushdown
  *    reach the parquet scan because every query projects/filters on the
  *    DataFrame before any action.
  *  - Nothing here collects to the driver.
  *
  * Oracle-determinism: the driver hash-compares our parquet output against
  * DuckDB running `SparkEntry.oracleSql` on the same tables. Double
  * aggregation is order-sensitive (parallel sums differ in last ulps), so:
  *  - money/quantity style SUM/AVG go through exact DECIMAL arithmetic and
  *    are cast back to DOUBLE at the end (exact: all magnitudes < 2^53);
  *  - per-row float math is rounded to 6 decimals (both engines see
  *    identical IEEE-754 inputs, so rounding is stable);
  *  - every query ORDER BYs a total (tie-broken) key.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** events.parquet carries TIMESTAMP(NANOS) which Spark has no native
    * type for; the session sets spark.sql.legacy.parquet.nanosAsLong and
    * we rebuild a micros timestamp here (integer `div` — a double divide
    * would lose precision on ~1e18 nano values). DuckDB truncates ns→µs
    * the same way, so the oracle sees identical instants. */
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Exact sum of a ~2-decimal double column: cast to DECIMAL (exact in
    * both Spark and DuckDB for clean inputs), sum without float error,
    * back to DOUBLE. `scale` must cover the data's true decimal scale. */
  def dsum(c: Column, scale: Int = 2, prec: Int = 18): Column =
    sum(c.cast(DecimalType(prec, scale))).cast("double")

  /** Exact avg built from dsum / count — final division is one IEEE op on
    * identical operands in both engines. */
  def davg(c: Column, scale: Int = 2): Column =
    (dsum(c, scale) / count(c)).cast("double")

  /** Exact sum of a product of two ~2-decimal doubles (scale 4 product). */
  def dsumProd(a: Column, b: Column): Column =
    sum(a.cast(DecimalType(18, 2)) * b.cast(DecimalType(18, 2))).cast("double")

  /** DuckDB SQL spellings of the same helpers (kept adjacent so the two
    * stay in sync). */
  def sqlDsum(e: String, scale: Int = 2): String =
    s"CAST(sum(CAST($e AS DECIMAL(18,$scale))) AS DOUBLE)"
  def sqlDavg(e: String, scale: Int = 2): String =
    s"(CAST(sum(CAST($e AS DECIMAL(18,$scale))) AS DOUBLE) / count($e))"
  def sqlDsumProd(a: String, b: String): String =
    s"CAST(sum(CAST($a AS DECIMAL(18,2)) * CAST($b AS DECIMAL(18,2))) AS DOUBLE)"
}
