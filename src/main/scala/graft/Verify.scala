package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** The only global-order windows left in the library are DELIBERATE
    * and O(tiny) by construction: the 40-row SAR-fixture forward fill
    * (the op is defined over file order) and the O(nBuckets)=32-row
    * carry table inside `forwardFillScalable` — the large-data path is
    * the bucketed two-pass fill (IngestSpec proves it). WindowExec's
    * blanket "No Partition Defined" WARN would read as a scale defect
    * in the driver-visible tail, so route that one logger to ERROR in
    * the two mains only — tests keep the warning, so an ACCIDENTAL
    * global window added later still surfaces in `sbt test` output. */
  def quietDeliberateWindowWarn(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // Non-ANSI: cast yields null on garbage (pandas to_numeric coerce
      // semantics, P2) and matches the oracle's TRY_CAST spelling.
      .config("spark.sql.ansi.enabled", "false")
      // events.parquet stores TIMESTAMP(NANOS); read as long, Tables.tbl
      // rebuilds a micros timestamp.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    quietDeliberateWindowWarn()
    new java.io.File(outDir).mkdirs()
    // harness setup: the SAR fixture some oracle SQL reads by absolute
    // path must exist before ANY phase (Spark or DuckDB) runs
    SarFixture.ensure()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
