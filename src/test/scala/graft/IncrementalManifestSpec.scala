package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Manifest
import graft.streaming.IncrementalManifest

/** Incremental-manifest invariants: the fold of per-batch partials
  * equals the one-shot batch fingerprint of the union (the group
  * property the design rests on), idempotent batch replay, lossless
  * compaction, and the empty store.
  */
class IncrementalManifestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def writeBatch(dir: Path, rows: Seq[(Long, String)]): Unit =
    rows.toDF("id", "text").coalesce(1)
      .write.mode("append").parquet(dir.toString)

  private def runOnce(in: Path, store: Path, ckpt: Path): Unit = {
    val rows = spark.readStream.schema("id LONG, text STRING")
      .parquet(in.toString)
    IncrementalManifest.run(rows, store.toString, ckpt.toString)
      .awaitTermination()
  }

  test("fold of streamed batches equals the one-shot fingerprint of the union") {
    val base = Files.createTempDirectory("graft-incman")
    val (in, store, ckpt) =
      (base.resolve("in"), base.resolve("store"), base.resolve("ckpt"))
    Files.createDirectories(in)
    assert(IncrementalManifest.read(spark, store.toString) == (0L, 0L),
      "an empty store must read as (0, 0)")

    val b1 = Seq((1L, "alpha"), (2L, "beta"), (3L, null.asInstanceOf[String]))
    val b2 = Seq((4L, "gamma"), (5L, "delta"))
    writeBatch(in, b1)
    runOnce(in, store, ckpt)
    writeBatch(in, b2)
    runOnce(in, store, ckpt)

    val streamed = IncrementalManifest.read(spark, store.toString)
    val (oneN, oneFp) = Manifest.fingerprint((b1 ++ b2).toDF("id", "text"))
    assert(streamed == (oneN, oneFp),
      s"incremental fold $streamed != one-shot ($oneN, $oneFp)")

    // idle restart: nothing new, nothing double-counted
    runOnce(in, store, ckpt)
    assert(IncrementalManifest.read(spark, store.toString) == (oneN, oneFp))

    // crash replay of a batch: reprocessing overwrites its own row
    IncrementalManifest.processBatch(b2.toDF("id", "text"), 1L, store.toString)
    assert(IncrementalManifest.read(spark, store.toString) == (oneN, oneFp),
      "a replayed batch must not double-count")

    // compaction folds losslessly
    IncrementalManifest.compact(spark, store.toString)
    assert(IncrementalManifest.read(spark, store.toString) == (oneN, oneFp))
    // and the store is now a single folded row
    assert(spark.read.parquet(store.toString).count() == 1)

    // POST-COMPACTION replays: a modular sum is not duplicate-tolerant,
    // so a batch folded into batch=0 must be skipped on replay — both
    // the double-count case (batch 1) and the fold-clobber case (batch 0)
    IncrementalManifest.processBatch(b2.toDF("id", "text"), 1L, store.toString)
    assert(IncrementalManifest.read(spark, store.toString) == (oneN, oneFp),
      "a batch replayed after its fold must not double-count")
    IncrementalManifest.processBatch(b1.toDF("id", "text"), 0L, store.toString)
    assert(IncrementalManifest.read(spark, store.toString) == (oneN, oneFp),
      "a batch-0 replay must not clobber the fold row")

    // new batches after compaction still land and fold forward
    val b3 = Seq((6L, "epsilon"))
    IncrementalManifest.processBatch(b3.toDF("id", "text"), 2L, store.toString)
    val (allN, allFp) = Manifest.fingerprint((b1 ++ b2 ++ b3).toDF("id", "text"))
    assert(IncrementalManifest.read(spark, store.toString) == (allN, allFp))
    // a second compaction folds again and keeps every marker honest
    IncrementalManifest.compact(spark, store.toString)
    IncrementalManifest.processBatch(b3.toDF("id", "text"), 2L, store.toString)
    assert(IncrementalManifest.read(spark, store.toString) == (allN, allFp),
      "markers must carry forward across repeated compactions")
  }

  private def copyDir(src: Path, dst: Path): Unit = {
    Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t) }
    }
  }

  test("a swap crashed AFTER its final rename does not double-count the sums") {
    // the crash window CompactionSwap previously mishandled: the
    // compacted rewrite is live, the pre-image still sits under `.old`
    // (delete never ran). The old unconditional fold-back would rename
    // the original batch dirs back in NEXT TO the batch=0 that already
    // contains their fold — exactly doubling n_rows and the modular
    // fingerprint of this sum-semantics store. The `_compacted` swap-id
    // marker now tells this state from a recreated-target restart, and
    // recovery deletes the provably-duplicated `.old` instead.
    val base = Files.createTempDirectory("graft-incman-swapcrash")
    val store = base.resolve("store")
    val b1 = Seq((1L, "alpha"), (2L, "beta"))
    val b2 = Seq((3L, "gamma"))
    IncrementalManifest.processBatch(b1.toDF("id", "text"), 0L, store.toString)
    IncrementalManifest.processBatch(b2.toDF("id", "text"), 1L, store.toString)
    val before = IncrementalManifest.read(spark, store.toString)

    // snapshot the pre-compaction store (what rename(target, old) strands)
    val preImage = base.resolve("preimage")
    copyDir(store, preImage)
    IncrementalManifest.compact(spark, store.toString)
    assert(IncrementalManifest.read(spark, store.toString) == before)
    // re-create the crash state: compacted store live, pre-image at .old
    copyDir(preImage, base.resolve("store.old"))

    // any reader path recovers first — and must NOT fold the duplicate back
    assert(IncrementalManifest.read(spark, store.toString) == before,
      "a completed swap's stranded .old must not double the manifest sums")
    assert(!Files.exists(base.resolve("store.old")),
      ".old must be consumed by recovery")
  }

  test("the RECREATED-target crash window still folds history back (no data loss)") {
    // the other sub-case: crash BETWEEN the renames, then the writer
    // restarted and recreated the target with a new batch before any
    // recovery ran — `.old` holds the only copy of old history and must
    // fold back, marker or no marker
    val base = Files.createTempDirectory("graft-incman-foldback")
    val store = base.resolve("store")
    val b1 = Seq((1L, "alpha"), (2L, "beta"))
    IncrementalManifest.processBatch(b1.toDF("id", "text"), 0L, store.toString)
    // crash between renames: live store moved wholesale to .old
    Files.move(store, base.resolve("store.old"))
    // restarted writer recreates the target with a NEW batch
    val b2 = Seq((3L, "gamma"))
    IncrementalManifest.processBatch(b2.toDF("id", "text"), 1L, store.toString)
    val (wantN, wantFp) =
      graft.io.Manifest.fingerprint((b1 ++ b2).toDF("id", "text"))
    assert(IncrementalManifest.read(spark, store.toString) == (wantN, wantFp),
      "pre-crash history under .old must fold back into the recreated store")
  }

  test("a torn store (directory with no committed footers) reads as (0, 0)") {
    val base = Files.createTempDirectory("graft-incman-torn")
    val store = base.resolve("store")
    // the state a first batch crashed mid-write leaves: the dir exists,
    // only uncommitted droppings inside, not one readable parquet footer
    Files.createDirectories(store.resolve("batch=0").resolve("_temporary"))
    assert(IncrementalManifest.read(spark, store.toString) == (0L, 0L),
      "a torn store must serve the documented empty manifest, not throw")
  }
}
