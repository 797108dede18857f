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
}
