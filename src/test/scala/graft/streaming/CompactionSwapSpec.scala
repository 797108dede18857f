package graft.streaming

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The hardened compaction swap: a crash stranded between the two renames
  * leaves live data only under `.old`. Recovery must restore it in BOTH
  * orderings — before anything recreates the target (simple roll-back) and
  * after the restarted writer has already recreated it (fold-in, never
  * delete). The latter is the data-loss window the advisor flagged: the old
  * code's unconditional `delete(.old)` discarded the full pre-compaction
  * history whenever the stream won the race.
  */
class CompactionSwapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def fs(dir: String) =
    CompactionSwap.fsFor(dir, spark.sparkContext.hadoopConfiguration)

  private def touch(p: Path, name: String): Unit = {
    Files.createDirectories(p)
    Files.write(p.resolve(name), "x".getBytes): Unit
  }

  private def children(p: Path): Set[String] =
    if (!Files.exists(p)) Set.empty
    else Files.list(p).map[String](_.getFileName.toString).toArray.map(_.toString).toSet

  test("dangling .old with no target rolls back wholesale") {
    val base = Files.createTempDirectory("graft-swap-rollback")
    val store = base.resolve("store")
    touch(base.resolve("store.old").resolve("batch=0"), "part-0")
    touch(base.resolve("store.old").resolve("batch=3"), "part-0")

    CompactionSwap.recoverDanglingOld(fs(store.toString), store.toString)
    assert(children(store) == Set("batch=0", "batch=3"))
    assert(!Files.exists(base.resolve("store.old")), ".old must be consumed")
  }

  test("dangling .old with a recreated target folds history in, target's replays win") {
    val base = Files.createTempDirectory("graft-swap-foldin")
    val store = base.resolve("store")
    // pre-compaction history stranded under .old: batches 0 and 5
    touch(base.resolve("store.old").resolve("batch=0"), "part-old")
    touch(base.resolve("store.old").resolve("batch=5"), "part-old")
    // the restarted stream recreated the target and REPLAYED batch 5
    // (idempotent overwrite) before recovery ran
    touch(store.resolve("batch=5"), "part-replayed")

    CompactionSwap.recoverDanglingOld(fs(store.toString), store.toString)
    assert(children(store) == Set("batch=0", "batch=5"),
      "history folded in alongside the recreated batches")
    assert(children(store.resolve("batch=5")) == Set("part-replayed"),
      "the replayed (target) copy of a batch present in both must win")
    assert(children(store.resolve("batch=0")) == Set("part-old"),
      "batches only in .old must be moved, not deleted")
    assert(!Files.exists(base.resolve("store.old")), ".old must be consumed")
  }

  test("recovery is a no-op without .old and swap refuses a missing target") {
    val base = Files.createTempDirectory("graft-swap-noop")
    val store = base.resolve("store")
    CompactionSwap.recoverDanglingOld(fs(store.toString), store.toString)
    assert(!Files.exists(store))
    assert(!CompactionSwap.swap(fs(store.toString), store.toString) { _ => fail("must not write") })
  }
}
