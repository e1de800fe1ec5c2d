package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall times at
  * SPARK_GRAFT_SF_DIR (driver default sf0.1).
  *
  * Measurement contract (fixes the r1 defects; hardened r5):
  *  - every query executes through the `noop` sink, which runs the FULL
  *    plan — a bare count() let Catalyst prune projection-only queries
  *    down to a row-count scan, timing fiction;
  *  - a failed query reports `-1` with its error in `errors`, instead
  *    of masquerading as a fast success;
  *  - warmup absorbs session/codegen/scan-pool startup AND MLlib
  *    class-loading (a 32-row LR fit — without it the first ml_* query
  *    was charged ~5 s of one-time classloader work);
  *  - the full suite runs TWICE post-warmup and each query reports the
  *    MIN of its two times: a single pass was at the mercy of
  *    transient machine load (r3 202.6 s vs r4 125.3 s vs 78.0 s on an
  *    idle rerun of the same code — pure contention noise); the
  *    per-query min of two interleaved passes is robust to load spikes
  *    because a spike must hit the SAME query in BOTH passes to show;
  *  - queries run in sorted-name order (stable across rounds).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Verify.quietDeliberateWindowWarn()

    def runOnce(name: String): (Double, Option[String]) = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, None)
      } catch {
        case e: Throwable =>
          (-1.0, Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"))
      }
    }

    // harness setup: file fixtures written before anything is timed
    SarFixture.ensure()
    // warmup, untimed: one SQL-path query + one tiny MLlib fit
    runOnce("q1_pricing_summary")
    try {
      import spark.implicits._
      val toy = (1 to 32).map(i => (i % 2.0, i * 1.0, (i % 7).toDouble))
        .toDF("label", "f_a", "f_b")
      graft.Model.pipeline(Seq("f_a", "f_b")).fit(toy)
    } catch { case _: Throwable => () }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val pass1 = names.map(n => n -> runOnce(n)).toMap
    val pass2 = names.map(n => n -> runOnce(n)).toMap
    // per-query min of the two passes; a pass that errored (-1) defers
    // to the other — a query is an error only if BOTH passes failed
    val results = names.map { n =>
      val (t1, e1) = pass1(n); val (t2, e2) = pass2(n)
      val t = (t1, t2) match {
        case (a, b) if a >= 0 && b >= 0 => math.min(a, b)
        case (a, _) if a >= 0 => a
        case (_, b) => b
      }
      n -> (t, if (t1 < 0 && t2 < 0) e1.orElse(e2) else None)
    }
    // escape ALL control chars — an exception message echoing raw input
    // bytes would otherwise break the driver's JSON parse of this line
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // 3-decimal per-query times: the driver captures only the LAST 2000
    // output chars, so the one JSON line must fit under that or the
    // head (alphabetically-first queries) is lost — full-double times
    // for ~75 queries overflowed it in r2
    def f3(t: Double): String = if (t < 0) "-1" else f"$t%.3f"
    val qs = results.map { case (k, (t, _)) => s"${q(k)}:${f3(t)}" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, (_, Some(e))) => s"${q(k)}:${q(e)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    val nErr = results.count(_._2._2.isDefined)
    def passTotal(p: Map[String, (Double, Option[String])]) =
      f3(p.values.map(_._1).filter(_ >= 0).sum)
    val line = s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"n_queries":${results.size},"n_errors":$nErr,"errors":$errs,"passes":[${passTotal(pass1)},${passTotal(pass2)}],"sf":"$sfDir"}"""
    // full line also lands in a file so local multi-run tooling
    // (tools/bench_compare.py) never depends on console truncation
    try {
      val dir = java.nio.file.Paths.get("target")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.write(dir.resolve("bench_last.json"),
        line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }
}
