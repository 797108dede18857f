package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.IncrementalHeavyHitters

/** Incremental heavy hitters (candidates + count-min): stream maintenance
  * with exact-at-fixture-scale estimates, restart accumulation across
  * batches, crash-replay idempotence, and ranking-preserving compaction.
  * Key frequencies here are far apart, so CMS estimate ordering equals
  * exact ordering (and with ~unique keys per cell, estimates are exact).
  */
class IncrementalHeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def writeBatch(dir: Path, rows: Seq[String]): Unit =
    rows.toDF("key").coalesce(1).write.mode("append").parquet(dir.toString)

  private def runOnce(in: Path, store: Path, ckpt: Path): Unit = {
    val rows = spark.readStream.schema("key STRING").parquet(in.toString)
    IncrementalHeavyHitters.run(rows, "key", store.toString, ckpt.toString,
      k = 3).awaitTermination()
  }

  private def topK(store: Path, k: Int = 3): Seq[(String, Long)] =
    IncrementalHeavyHitters.readTopK(spark, store.toString, k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("counts accumulate across batches and a restart; ranking follows totals") {
    val base = Files.createTempDirectory("graft-inchh")
    val (in, store, ckpt) =
      (base.resolve("in"), base.resolve("store"), base.resolve("ckpt"))
    Files.createDirectories(in)

    writeBatch(in, Seq.fill(10)("alpha") ++ Seq.fill(6)("beta") ++ Seq("gamma"))
    runOnce(in, store, ckpt)
    assert(topK(store).take(2) == Seq(("alpha", 10L), ("beta", 6L)))

    // restart: beta surges past alpha GLOBALLY only when merged
    writeBatch(in, Seq.fill(9)("beta") ++ Seq.fill(2)("delta"))
    runOnce(in, store, ckpt)
    assert(topK(store) == Seq(("beta", 15L), ("alpha", 10L), ("delta", 2L)))
  }

  test("a key heavy only in aggregate still surfaces if it tops some batch") {
    val base = Files.createTempDirectory("graft-inchh2")
    val (in, store, ckpt) =
      (base.resolve("in"), base.resolve("store"), base.resolve("ckpt"))
    Files.createDirectories(in)
    // slow is batch-1's top key; batch 2's noise doesn't evict it from
    // the candidate union, and the merged sketch scores its TOTAL
    writeBatch(in, Seq.fill(4)("slow") ++ Seq("x1", "x2"))
    runOnce(in, store, ckpt)
    writeBatch(in, Seq.fill(3)("slow") ++ Seq.fill(5)("loud"))
    runOnce(in, store, ckpt)
    val got = topK(store, 2)
    assert(got == Seq(("slow", 7L), ("loud", 5L)), s"got $got")
  }

  test("crash-replayed batch overwrites itself: estimates unchanged") {
    val base = Files.createTempDirectory("graft-inchh-replay")
    val store = base.resolve("store").toString
    val batch = (Seq.fill(5)("a") ++ Seq.fill(2)("b")).toDF("key")
    IncrementalHeavyHitters.processBatch(batch, 0L, "key", store, 1e-4, 0.999, 42, 3)
    IncrementalHeavyHitters.processBatch(batch, 0L, "key", store, 1e-4, 0.999, 42, 3)
    val got = IncrementalHeavyHitters.readTopK(spark, store, 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 5L), ("b", 2L)), s"replay double-counted: $got")
  }

  test("compaction folds both stores without changing the served ranking") {
    val base = Files.createTempDirectory("graft-inchh-compact")
    val store = base.resolve("store").toString
    Seq(
      (0L, Seq.fill(5)("a") ++ Seq.fill(3)("b")),
      (1L, Seq.fill(4)("b") ++ Seq.fill(2)("c")),
      (2L, Seq.fill(1)("a"))
    ).foreach { case (id, rows) =>
      IncrementalHeavyHitters.processBatch(rows.toDF("key"), id, "key",
        store, 1e-4, 0.999, 42, 3)
    }
    val before = IncrementalHeavyHitters.readTopK(spark, store, 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    IncrementalHeavyHitters.compactStore(spark, store)
    val after = IncrementalHeavyHitters.readTopK(spark, store, 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(after == before, s"compaction changed the ranking: $before -> $after")
    assert(before == Seq(("b", 7L), ("a", 6L), ("c", 2L)))
    // one physical row per store after the fold
    assert(spark.read.parquet(s"$store/sketch").count() == 1L)
  }

  test("serving before the first batch returns the empty frame, not a failure") {
    val base = Files.createTempDirectory("graft-inchh-empty")
    val store = base.resolve("store").toString
    val got = IncrementalHeavyHitters.readTopK(spark, store, 5)
    assert(got.columns.toSeq == Seq("key", "est_count"))
    assert(got.count() == 0L, "empty store must serve an empty ranking")
  }
}
