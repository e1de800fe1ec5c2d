package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Deploy-mode-aware lineage pin for iterative operators (PageRank,
  * Components, LabelProp, Bfs, ...): every round's result feeds the
  * next round's plan, so without truncation the logical plan nests one
  * level per round (re-analysis + re-codegen cost grows with round
  * count, and in Components' case exponentially).
  *
  * - local mode: `localCheckpoint(eager)` — executor-local shuffle/
  *   block storage is as durable as the single JVM anyway, and it
  *   truncates lineage at the cost of one materialization.
  * - cluster mode: `localCheckpoint` is LOSSY (blocks die with their
  *   executor and the truncated lineage cannot recompute them), so pin
  *   via reliable `checkpoint` when the context has a checkpoint dir
  *   (HDFS/S3 — survives executor loss), else disk-persist +
  *   materialize: recomputable on executor loss, and the eager count
  *   keeps iteration-frame sizes known so per-round joins stay
  *   broadcastable. Persist does NOT truncate the logical plan, which
  *   is acceptable at the O(log n) round counts these operators run;
  *   deep traversals on a cluster should set a checkpoint dir.
  */
object Graft {
  /** Pin `df`; `release` is the frame this pin SUPERSEDES (the previous
    * round's pin) — iterative callers pass it so the persist-mode
    * fallback unpersists superseded rounds instead of accumulating one
    * DISK_ONLY frame per round for the session lifetime. Released only
    * AFTER the new pin materializes (the new round reads the old one).
    * In the localCheckpoint/checkpoint modes `DataFrame.unpersist` is a
    * CacheManager no-op (the frame was never plan-cached) and the
    * checkpointed RDDs stay with the ContextCleaner — harmless. */
  def pin(df: DataFrame, release: Option[DataFrame] = None): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val pinned =
      if (sc.isLocal) df.localCheckpoint(eager = true)
      else if (sc.getCheckpointDir.isDefined) df.checkpoint(eager = true)
      else {
        val p = df.persist(StorageLevel.DISK_ONLY)
        p.count()
        p
      }
    release.foreach(_.unpersist(blocking = false))
    pinned
  }
}
