package graft.streaming

import java.net.URI
import java.util.concurrent.atomic.AtomicLong
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Crash-injection control for [[CrashFs]] — JVM-global, so ops from
  * Spark's executor threads (local mode, same JVM) count too. Arm with
  * a budget of k mutating operations; operation k and every one after
  * it throws, which models a process death at that point: the ops
  * simply never happen (compensating code that RELIES on later fs ops
  * — rollbacks, cleanup — fails the same way it would in a real crash).
  */
object CrashFs {
  private[streaming] val SchemeUri = URI.create("crash:///")
  private val budget = new AtomicLong(Long.MaxValue)
  private val ops = new AtomicLong(0L)

  /** Count mutating ops without crashing (the dry run that sizes the
    * exhaustive loop).
    */
  def armCounting(): Unit = { ops.set(0); budget.set(Long.MaxValue) }

  /** Crash on the (k+1)-th and all subsequent mutating ops. */
  def armCrashAfter(k: Long): Unit = { ops.set(0); budget.set(k) }

  def disarm(): Unit = budget.set(Long.MaxValue)

  def opCount: Long = ops.get()

  private[streaming] def tick(op: String, p: Path): Unit = {
    ops.incrementAndGet()
    if (budget.decrementAndGet() < 0)
      throw new java.io.IOException(s"injected crash at $op $p")
  }
}

/** A `crash://` filesystem over the local disk that fails every
  * MUTATING operation (create/rename/delete/mkdirs) once the armed
  * budget is exhausted — the injection point for [[CrashFuzzSpec]]'s
  * exhaustive crash-schedule sweep. Reads are never failed: a crashed
  * process doesn't corrupt what it already wrote, it just stops
  * writing. Register via `fs.crash.impl` and address local paths as
  * `crash:///abs/path`.
  */
class CrashFs extends RawLocalFileSystem {
  override def getScheme: String = "crash"
  // no instance field: RawLocalFileSystem's CONSTRUCTOR already calls
  // getUri (via getInitialWorkingDirectory), before Scala field
  // initializers have run
  override def getUri: URI = CrashFs.SchemeUri
  override def initialize(name: URI, conf: Configuration): Unit =
    super.initialize(CrashFs.SchemeUri, conf)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    CrashFs.tick("create", f)
    super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    CrashFs.tick("rename", src)
    super.rename(src, dst)
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    CrashFs.tick("delete", p)
    super.delete(p, recursive)
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    CrashFs.tick("mkdirs", f)
    super.mkdirs(f, permission)
  }
}
