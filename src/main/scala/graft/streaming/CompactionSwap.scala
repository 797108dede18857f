package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-recoverable directory swap shared by the two log compactors
  * ([[EventsStream.compactUpsertLog]], [[IncrementalDedup.compactStore]]).
  *
  * The swap is the three-step dance: write the rewrite to `<dir>.compacting`,
  * rename the live dir to `<dir>.old`, rename the rewrite into place, drop
  * `.old`. A crash can strand the system between the two renames — live data
  * exists only under `.old`. Two recovery situations follow:
  *
  *  - target missing, `.old` present: simple roll-back, rename `.old` back.
  *  - target present AND `.old` present: TWO sub-cases, told apart by the
  *    `_compacted` swap-id marker the rewrite writes before the renames
  *    (round 16 — previously the fold-back below ran unconditionally and
  *    DOUBLE-COUNTED sum-semantics stores):
  *      * the target carries a `_compacted` id that `.old` does not — the
  *        swap COMPLETED (crash was between the final rename and the
  *        `.old` delete), so `.old` is exactly the pre-image whose content
  *        the target's rewrite already folded in. Folding it back would
  *        duplicate every row — harmless for set-like stores but exactly
  *        doubling [[IncrementalManifest]]'s row/fingerprint sums and
  *        [[IncrementalHeavyHitters]]' CMS counts. `.old` is provably
  *        duplicated (it was renamed wholesale from the dir the rewrite
  *        consumed), so it is deleted.
  *      * otherwise the writer stream restarted before recovery ran and
  *        recreated the target (appended new batches/files). Deleting
  *        `.old` would permanently discard the entire pre-compaction
  *        history, so recovery FOLDS `.old` back in: every child of
  *        `.old` the recreated target doesn't already have is renamed
  *        into the target. A child present in both can only be a replayed
  *        idempotent batch subdir (`batch=<id>` written with overwrite
  *        semantics), so the target's copy is kept. Part-file children
  *        (the flat upsert log) carry task-UUID names and cannot collide.
  *        (The underscore-prefixed marker is invisible to parquet
  *        readers, like `_SUCCESS`.)
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

  private val MarkerName = "_compacted"

  private def readMarker(fs: FileSystem, dir: Path): Option[String] = {
    val m = new Path(dir, MarkerName)
    if (!fs.exists(m)) None
    else {
      val buf = new Array[Byte](fs.getFileStatus(m).getLen.toInt)
      val in = fs.open(m)
      try in.readFully(buf) finally in.close()
      Some(new String(buf, java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  private def writeMarker(fs: FileSystem, dir: Path, id: String): Unit = {
    val out = fs.create(new Path(dir, MarkerName), true)
    try out.write(id.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Recover a `.old` directory stranded by a swap that crashed between
    * its two renames (or after the final rename, before the `.old`
    * delete). No-op when no `.old` exists. See class doc for the cases;
    * never deletes data that isn't provably duplicated.
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
    // completed-swap detection: the target carries THIS swap's marker id
    // and `.old` does not (its marker, if any, is from an earlier swap) —
    // `.old` is the consumed pre-image, already folded into the target's
    // rewrite; folding it back would double-count sum-semantics stores
    val targetId = readMarker(fs, target)
    if (targetId.isDefined && readMarker(fs, old) != targetId) {
      fs.delete(old, true)
      return
    }
    fs.listStatus(old).foreach { st =>
      val dst = new Path(target, st.getPath.getName)
      if (!fs.exists(dst)) {
        if (!fs.rename(st.getPath, dst))
          throw new java.io.IOException(s"compaction recovery failed: ${st.getPath} -> $dst")
      } else if (st.isDirectory && st.getPath.getName.startsWith("_")) {
        // marker dirs (`_folded`/`_committed`): merge children one by
        // one — keeping only the recreated target's copy would drop
        // every pre-compaction marker, silently re-opening the
        // double-count window the markers exist to close (and leaving
        // the folded-back batches permanently unfoldable)
        fs.listStatus(st.getPath).foreach { m =>
          val mdst = new Path(dst, m.getPath.getName)
          // a swallowed rename failure followed by the delete below
          // would silently drop the marker and reopen the double-count
          // window — fail loudly like the batch-dir branch above
          if (!fs.exists(mdst) && !fs.rename(m.getPath, mdst))
            throw new java.io.IOException(
              s"compaction recovery failed: ${m.getPath} -> $mdst")
        }
        fs.delete(st.getPath, true)
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
    // fresh swap id, written BEFORE the renames: recovery uses it to
    // tell a completed swap's stranded `.old` (delete — its content is
    // already in the rewrite) from a recreated target (fold back)
    writeMarker(fs, tmp, java.util.UUID.randomUUID().toString)
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

// The shared `batch=<id>` store protocol lives in [[BatchStore]]
// (its own file since round 17 — one implementation of idempotent
// batch subdirs, strictly-earlier lookups, graceful torn reads, and
// marked-swap compaction for every incremental store in this package).
