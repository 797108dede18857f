package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Crash-recoverable directory swap shared by the two log compactors
  * ([[EventsStream.compactUpsertLog]], [[IncrementalDedup.compactStore]]).
  *
  * The swap is the three-step dance: write the rewrite to `<dir>.compacting`,
  * rename the live dir to `<dir>.old`, rename the rewrite into place, drop
  * `.old`. A crash can strand the system between the two renames — live data
  * exists only under `.old`. Two recovery situations follow:
  *
  *  - target missing, `.old` present: simple roll-back, rename `.old` back.
  *  - target present AND `.old` present: the writer stream restarted before
  *    recovery ran and recreated the target (appended new batches/files).
  *    Deleting `.old` here would permanently discard the entire
  *    pre-compaction history, so recovery instead FOLDS `.old` back in:
  *    every child of `.old` that the recreated target doesn't already have
  *    is renamed into the target. A child present in both can only be a
  *    replayed idempotent batch subdir (`batch=<id>` written with overwrite
  *    semantics), so the target's copy is kept. Part-file children (the
  *    flat upsert log) carry task-UUID names and cannot collide.
  *
  * [[recoverDanglingOld]] is called at every point a writer (re)starts and
  * at the top of each compaction, so the window where history is only under
  * `.old` closes at the first subsequent write or compaction, whichever
  * comes first. Single-writer contract: never call concurrently with a
  * running compaction on the same dir.
  */
private[graft] object CompactionSwap {

  /** The filesystem OF `dir` (not the default FS — an `hdfs://`/`s3a://`
    * store with a `file:` default FS would otherwise fail with Wrong-FS).
    */
  def fsFor(dir: String, conf: Configuration): FileSystem =
    new Path(dir).getFileSystem(conf)

  /** Recover a `.old` directory stranded by a swap that crashed between
    * its two renames. No-op when no `.old` exists. See class doc for the
    * two cases; never deletes data that isn't provably duplicated.
    */
  def recoverDanglingOld(fs: FileSystem, dir: String): Unit = {
    val target = new Path(dir)
    val old = new Path(dir + ".old")
    if (!fs.exists(old)) return
    if (!fs.exists(target)) {
      if (!fs.rename(old, target))
        throw new java.io.IOException(s"compaction recovery failed: $old -> $target")
      return
    }
    fs.listStatus(old).foreach { st =>
      val dst = new Path(target, st.getPath.getName)
      if (!fs.exists(dst)) {
        if (!fs.rename(st.getPath, dst))
          throw new java.io.IOException(s"compaction recovery failed: ${st.getPath} -> $dst")
      } else fs.delete(st.getPath, true) // replayed idempotent batch: target's copy wins
    }
    fs.delete(old, true): Unit
  }

  /** Run the full swap: recover any dangling `.old`, have `write` produce
    * the compacted rewrite at the supplied tmp path, then swap it into
    * place. `write` receives the tmp dir as a string path. Returns false
    * when the target doesn't exist (nothing to compact).
    */
  def swap(fs: FileSystem, dir: String)(write: String => Unit): Boolean = {
    val target = new Path(dir)
    val tmp = new Path(dir + ".compacting")
    val old = new Path(dir + ".old")
    recoverDanglingOld(fs, dir)
    if (!fs.exists(target)) return false // nothing ingested yet
    fs.delete(tmp, true)
    write(tmp.toString)
    if (!fs.rename(target, old))
      throw new java.io.IOException(s"compaction swap failed: $target -> $old")
    if (!fs.rename(tmp, target)) {
      fs.rename(old, target) // roll back to the pre-compaction data
      throw new java.io.IOException(s"compaction swap failed: $tmp -> $target")
    }
    fs.delete(old, true)
    true
  }
}

/** The shared `batch=<id>`-per-microbatch store protocol used by both
  * incremental dedup stores ([[IncrementalDedup]] signatures,
  * [[IncrementalEmbedDedup]] vectors): idempotent batch subdirs, a
  * strictly-earlier lookup rule for crash-replay safety, and compaction
  * into a single `batch=0` (which sorts below every live microbatch id)
  * via the crash-recoverable [[CompactionSwap.swap]]. One implementation
  * — the recovery ordering and the batch-dir filter can't drift between
  * the two stores.
  */
private[streaming] object BatchStore {

  /** `batch=<id>` subdirs of `storeDir` with id strictly below `batchId`
    * (replay safety: a replayed batch never joins against its own
    * half-written output). Recovers any dangling `.old` first — a
    * stranded compaction would otherwise hide the entire history.
    */
  def listPriorBatches(spark: SparkSession, storeDir: String,
                       batchId: Long): Seq[String] = {
    val fs = CompactionSwap.fsFor(storeDir,
      spark.sparkContext.hadoopConfiguration)
    CompactionSwap.recoverDanglingOld(fs, storeDir)
    val root = new Path(storeDir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        p.getName.startsWith("batch=") &&
          scala.util.Try(p.getName.stripPrefix("batch=").toLong)
            .toOption.exists(_ < batchId)
      }
      .map(_.toString)
  }

  /** Compact every batch dir into `batch=0` under a crash-recoverable
    * swap. `rewrite(batches, tmpBatch0Dir)` does the store-specific
    * merge write. Single-writer contract: stop the stream first.
    */
  def compact(spark: SparkSession, storeDir: String)
             (rewrite: (Seq[String], String) => Unit): Unit = {
    val fs = CompactionSwap.fsFor(storeDir,
      spark.sparkContext.hadoopConfiguration)
    CompactionSwap.recoverDanglingOld(fs, storeDir)
    val batches = listPriorBatches(spark, storeDir, Long.MaxValue)
    if (batches.isEmpty) return
    CompactionSwap.swap(fs, storeDir) { tmp =>
      rewrite(batches, s"$tmp/batch=0")
    }: Unit
  }
}
