package graft.streaming

import java.nio.file.{Files, Path => JPath}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import StoreHarness.{adapters, StoreAdapter}

/** THE shared incremental-store contract, asserted once and run against
  * every store in this package (round-17: previously each store pinned
  * its own subset in its own spec, and round 16 had to patch torn-store
  * reads store-by-store — the duplication was already costing).
  *
  * Contract items, per store:
  *  1. '''replay idempotence''' — re-running a batch id (foreachBatch's
  *     crash-replay semantics) leaves every observable state unchanged;
  *  2. '''compaction invisibility''' — compacting preserves state, a
  *     batch replayed AFTER its fold neither double-counts nor clobbers,
  *     and post-compaction ingest converges to the never-compacted twin;
  *  3. '''graceful empty/torn reads''' — serving from a store that does
  *     not exist, or whose directory exists with no committed parquet
  *     footer (first batch crashed mid-write), returns the documented
  *     empty value instead of throwing;
  *  4. '''dangling-`.old` recovery''' — a compaction swap crashed
  *     between its renames (history only under `.old`) is invisible to
  *     the next serving read.
  *
  * The adapters ([[StoreHarness]]) bind the contract to each store's
  * real entry points over deterministic per-batch fixture data.
  * Store-SPECIFIC semantics (dedup pair correctness, sketch estimates,
  * drift verdicts) stay in the per-store specs; this spec pins only the
  * shared protocol. [[CrashFuzzSpec]] completes the picture by
  * exhausting crash points over the compaction path.
  */
class BatchStoreContractSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft-contract-$tag").toString

  // ---- the contract ----------------------------------------------------

  for (a <- adapters) {
    test(s"${a.name}: a replayed batch id leaves every observable state unchanged") {
      val root = freshRoot(a.name)
      a.ingest(root, 0); a.ingest(root, 1)
      val s = a.state(root)
      a.ingest(root, 1) // crash replay: same id, same data
      assert(a.state(root) == s)
      a.ingest(root, 0) // an OLD id replayed after later batches landed
      assert(a.state(root) == s)
    }
  }

  for (a <- adapters if a.compact.isDefined) {
    test(s"${a.name}: compaction preserves state; post-fold replay and ingest converge") {
      val root = freshRoot(a.name)
      (0 to 2).foreach(a.ingest(root, _))
      val s = a.state(root)
      a.compact.get(root)
      assert(a.state(root) == s, "compaction must be invisible to serving")
      a.ingest(root, 2) // replay of a batch already folded into batch=0
      assert(a.state(root) == s, "a folded batch's replay must not double-count")
      a.ingest(root, 3)
      val twin = freshRoot(s"${a.name}-twin")
      (0 to 3).foreach(a.ingest(twin, _))
      assert(a.state(root) == a.state(twin),
        "compacted + new ingest must equal the never-compacted twin")
    }
  }

  for (a <- adapters if a.compact.isDefined) {
    test(s"${a.name}: an UNMARKED batch dir is never folded — its replay still converges") {
      val root = freshRoot(s"${a.name}-unmarked")
      (0 to 2).foreach(a.ingest(root, _))
      // simulate a write that crashed between the parquet commit and the
      // _committed marker (or a torn dir — the two are indistinguishable
      // on disk): drop batch 2's marker from every swap-governed dir
      val fs = CompactionSwap.fsFor(root,
        spark.sparkContext.hadoopConfiguration)
      a.swapDirs(root).foreach { d =>
        fs.delete(new Path(s"$d/_committed/2"), false): Unit
      }
      a.compact.get(root) // must carry batch 2 verbatim, not fold it
      a.swapDirs(root).foreach { d =>
        assert(fs.exists(new Path(s"$d/batch=2")),
          s"$d: the unmarked batch dir must ride the swap verbatim")
        assert(!fs.exists(new Path(s"$d/_folded/2")),
          s"$d: an unmarked batch must never be recorded as folded")
      }
      a.ingest(root, 2) // the replay (not skipped — never folded)
      a.ingest(root, 3)
      val twin = freshRoot(s"${a.name}-unmarked-twin")
      (0 to 3).foreach(a.ingest(twin, _))
      assert(a.state(root) == a.state(twin),
        "replay of the unmarked batch + new ingest must equal the twin")
    }
  }

  for (a <- adapters; empty <- a.emptyState) {
    test(s"${a.name}: serving an absent or torn (no-footer) store is graceful") {
      val absent = freshRoot(s"${a.name}-absent")
      val onAbsent = empty(s"$absent/nonexistent-sub")
      // torn: the dir exists (mkdirs + a _temporary leftover, the real
      // artifact of a first batch that died mid-write) but holds no
      // committed parquet footer
      val torn = freshRoot(s"${a.name}-torn")
      Files.createDirectories(JPath.of(s"$torn/store/_temporary/0"))
      val onTorn = empty(torn)
      assert(onAbsent == onTorn, "absent and torn stores must serve the same empty value")
    }
  }

  test("a store refuses a stream started with a DIFFERENT checkpoint (id-collision guard)") {
    import spark.implicits._
    val root = freshRoot("bind")
    val store = s"$root/store"
    // binding a not-yet-existing store is a no-op (the marker must not
    // create the dir and flip empty-serving checks) …
    BatchStore.bindCheckpoint(spark, s"$root/ckptA", store)
    val fs = CompactionSwap.fsFor(root, spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(store)))
    // … so after the first batch lands, the next start binds it
    BatchStore.writeBatch(Seq((1L, "x")).toDF("k", "v"), store, 0L)
    BatchStore.bindCheckpoint(spark, s"$root/ckptA", store)
    // same checkpoint: restarts are fine
    BatchStore.bindCheckpoint(spark, s"$root/ckptA", store)
    // a FRESH checkpoint against the bound store must fail loudly — its
    // batch ids restart at 0 and would overwrite (or skip, if folded)
    // same-id history
    val e = intercept[IllegalStateException] {
      BatchStore.bindCheckpoint(spark, s"$root/ckptB", store)
    }
    assert(e.getMessage.contains("ckptA") && e.getMessage.contains("ckptB"))
    // the marker is invisible to serving reads
    assert(BatchStore.readAll(spark, store).get.count() == 1)
  }

  test("a replay-overwrite crash cannot freeze a committed marker (retract-then-write)") {
    import spark.implicits._
    val root = freshRoot("retract")
    val store = s"$root/store"
    BatchStore.writeBatch(Seq((1L, "x")).toDF("k", "v"), store, 0L)
    BatchStore.writeBatch(Seq((2L, "y")).toDF("k", "v"), store, 1L)
    val fs = CompactionSwap.fsFor(root, spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(s"$store/_committed/1")))
    // simulate batch 1's replay overwrite dying mid-parquet: the marker
    // must already be GONE at that point (writeBatch retracts first), so
    // emulate the on-disk state it guarantees — torn dir, no marker
    fs.delete(new Path(s"$store/_committed/1"), false)
    // compaction must neither fold the torn dir nor record it as folded
    BatchStore.compact(spark, store) { (batches, out) =>
      spark.read.parquet(batches: _*).write.parquet(out)
    }
    assert(fs.exists(new Path(s"$store/batch=1")), "torn dir must ride verbatim")
    assert(!fs.exists(new Path(s"$store/_folded/1")))
    // and a torn batch=0 defers compaction entirely (name-collision with
    // the fold target: carrying it would merge into the fold, and its
    // replay would overwrite the fold)
    val root2 = freshRoot("retract0")
    val store2 = s"$root2/store"
    BatchStore.writeBatch(Seq((1L, "x")).toDF("k", "v"), store2, 0L)
    BatchStore.writeBatch(Seq((2L, "y")).toDF("k", "v"), store2, 1L)
    val fs2 = CompactionSwap.fsFor(root2, spark.sparkContext.hadoopConfiguration)
    fs2.delete(new Path(s"$store2/_committed/0"), false)
    BatchStore.compact(spark, store2) { (batches, out) =>
      spark.read.parquet(batches: _*).write.parquet(out)
    }
    assert(fs2.exists(new Path(s"$store2/batch=1")) &&
      !fs2.exists(new Path(s"$store2/_folded")),
      "a torn batch=0 must defer the whole compaction")
  }

  for (a <- adapters if a.compact.isDefined) {
    test(s"${a.name}: the checkpoint binding survives compaction (guard stays armed)") {
      val root = freshRoot(s"${a.name}-bindcompact")
      (0 to 2).foreach(a.ingest(root, _))
      BatchStore.bindCheckpoint(spark, s"$root/ckptA", a.swapDirs(root): _*)
      a.compact.get(root)
      val fs = CompactionSwap.fsFor(root, spark.sparkContext.hadoopConfiguration)
      a.swapDirs(root).foreach { d =>
        assert(fs.exists(new Path(s"$d/_checkpoint")),
          s"$d: the swap must carry the binding marker (round-18 fix — " +
            "dropping it silently disarmed the identity guard)")
      }
      // the guard is still armed: a fresh checkpoint fails loudly …
      intercept[IllegalStateException] {
        BatchStore.bindCheckpoint(spark, s"$root/ckptB", a.swapDirs(root): _*)
      }
      // … and the rightful checkpoint still binds
      BatchStore.bindCheckpoint(spark, s"$root/ckptA", a.swapDirs(root): _*)
    }
  }

  test("a deleted-and-recreated checkpoint (same path, fresh query id) fails loudly") {
    import spark.implicits._
    val root = freshRoot("queryid")
    val store = s"$root/store"
    val ckpt = s"$root/ckpt"
    val fs = CompactionSwap.fsFor(root, spark.sparkContext.hadoopConfiguration)
    def stampMetadata(id: String): Unit = {
      val out = fs.create(new Path(s"$ckpt/metadata"), true)
      try out.write(s"""{"id":"$id"}""".getBytes("UTF-8")) finally out.close()
    }
    // the stream is running: metadata exists, the first batch binds
    stampMetadata("aaaa-1111")
    BatchStore.ensureBound(spark, ckpt, store)
    BatchStore.writeBatch(Seq((1L, "x")).toDF("k", "v"), store, 0L)
    BatchStore.ensureBound(spark, ckpt, store) // every later batch re-verifies
    // operator deletes and recreates the checkpoint at the SAME path —
    // Spark mints a fresh query id; batch ids restart at 0
    stampMetadata("bbbb-2222")
    val e = intercept[IllegalStateException] {
      BatchStore.ensureBound(spark, ckpt, store)
    }
    assert(e.getMessage.contains("aaaa-1111") && e.getMessage.contains("bbbb-2222"))
    // the start-time guard catches the deleted-but-not-yet-recreated case
    fs.delete(new Path(ckpt), true)
    val e2 = intercept[IllegalStateException] {
      BatchStore.bindCheckpoint(spark, ckpt, store)
    }
    assert(e2.getMessage.contains("no metadata"))
    // a pre-round-18 marker (path only) upgrades in place instead of failing
    val legacy = s"$root/legacy"
    BatchStore.writeBatch(Seq((1L, "x")).toDF("k", "v"), legacy, 0L)
    val out = fs.create(new Path(s"$legacy/_checkpoint"), true)
    try out.write(ckpt.getBytes("UTF-8")) finally out.close()
    stampMetadata("cccc-3333")
    BatchStore.ensureBound(spark, ckpt, legacy)
    stampMetadata("dddd-4444")
    intercept[IllegalStateException] { BatchStore.ensureBound(spark, ckpt, legacy) }
  }

  test("legacy marker upgrade refuses a checkpoint whose commit log does not cover the history") {
    import spark.implicits._
    val root = freshRoot("legacyhwm")
    val ckpt = s"$root/ckpt"
    val fs = CompactionSwap.fsFor(root, spark.sparkContext.hadoopConfiguration)
    def stampMetadata(id: String): Unit = {
      val out = fs.create(new Path(s"$ckpt/metadata"), true)
      try out.write(s"""{"id":"$id"}""".getBytes("UTF-8")) finally out.close()
    }
    def stampLegacyMarker(store: String): Unit = {
      val out = fs.create(new Path(s"$store/_checkpoint"), true)
      try out.write(ckpt.getBytes("UTF-8")) finally out.close()
    }
    val df = Seq((1L, "x")).toDF("k", "v")
    // a legacy store with history past batch 0, against a checkpoint
    // with NO commit log (deleted and recreated before the first
    // post-upgrade run): the in-place upgrade is refused — stamping the
    // fresh id would bless same-id overwrites the _hwm guard cannot see
    // (batch dirs still exist)
    val store = s"$root/store"
    (0L to 2L).foreach(BatchStore.writeBatch(df, store, _))
    stampLegacyMarker(store)
    stampMetadata("ffff-0000")
    val e = intercept[IllegalStateException] {
      BatchStore.ensureBound(spark, ckpt, store)
    }
    assert(e.getMessage.contains("commit log"))
    // same store, but the checkpoint's commit log covers hwm - 1: a
    // legitimate same-checkpoint continuation (the newest store batch
    // may land before its checkpoint commit) — upgrade proceeds and the
    // binding holds on the next batch
    fs.mkdirs(new Path(s"$ckpt/commits"))
    fs.create(new Path(s"$ckpt/commits/1"), true).close()
    BatchStore.ensureBound(spark, ckpt, store)
    BatchStore.ensureBound(spark, ckpt, store) // now id-bound, still green
    // the hwm-0 residual window stays an upgrade (the existing legacy
    // test's shape): only-batch-0 history is indistinguishable from a
    // crash-before-commit-0 replay
    val store0 = s"$root/store0"
    BatchStore.writeBatch(df, store0, 0L)
    stampLegacyMarker(store0)
    BatchStore.ensureBound(spark, ckpt, store0)
  }

  test("high-water guard refuses id-collision writes but passes every legitimate replay") {
    import spark.implicits._
    val root = freshRoot("hwm")
    val store = s"$root/store"
    val df = Seq((1L, "x")).toDF("k", "v")
    (0L to 2L).foreach(BatchStore.writeBatch(df, store, _))
    val fs = CompactionSwap.fsFor(root, spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(s"$store/_hwm")))
    // legitimate: replaying an id whose dir still exists (torn or whole)
    BatchStore.writeBatch(df, store, 1L)
    // legitimate: a replay whose previous attempt died AFTER the
    // overwrite deleted the old dir — the _replaying breadcrumb
    // sanctions it
    fs.delete(new Path(s"$store/batch=1"), true)
    fs.delete(new Path(s"$store/_committed/1"), false)
    fs.create(new Path(s"$store/_replaying/1"), true).close()
    BatchStore.writeBatch(df, store, 1L) // heals
    assert(BatchStore.readAll(spark, store).get.count() == 3)
    // id collision: a below-high-water id with no dir, no fold record,
    // no breadcrumb — a checkpoint that restarted numbering
    fs.delete(new Path(s"$store/batch=1"), true)
    fs.delete(new Path(s"$store/_committed/1"), false)
    val e = intercept[IllegalStateException] { BatchStore.writeBatch(df, store, 1L) }
    assert(e.getMessage.contains("high-water"))
    // folded ids pass the guard (the store-level isFolded check is what
    // skips them; writeBatch itself must not wedge a post-compaction
    // replay that a store chooses to route differently)
    val store2 = s"$root/store2"
    (0L to 2L).foreach(BatchStore.writeBatch(df, store2, _))
    BatchStore.compact(spark, store2) { (batches, out) =>
      spark.read.parquet(batches: _*).write.parquet(out)
    }
    assert(fs.exists(new Path(s"$store2/_hwm")), "compaction must carry _hwm")
    assert(BatchStore.isFolded(spark, store2, 2L))
    BatchStore.writeBatch(df, store2, 2L) // folded: allowed through
  }

  test("marker-write crash residue never bricks or exempts: empty marker re-stamps, stale breadcrumb GCs") {
    import spark.implicits._
    val root = freshRoot("residue")
    val store = s"$root/store"
    val fs = CompactionSwap.fsFor(root, spark.sparkContext.hadoopConfiguration)
    val df = Seq((1L, "x")).toDF("k", "v")
    (0L to 2L).foreach(BatchStore.writeBatch(df, store, _)) // hwm = 2
    // a crash inside the _checkpoint write leaves a truncated (empty)
    // marker — it must read as ABSENT and re-stamp, not as a binding to
    // '' that refuses every start forever
    fs.create(new Path(s"$store/_checkpoint"), true).close() // zero bytes
    BatchStore.bindCheckpoint(spark, s"$root/ckptA", store) // re-stamps
    BatchStore.bindCheckpoint(spark, s"$root/ckptA", store) // and verifies
    intercept[IllegalStateException] {
      BatchStore.bindCheckpoint(spark, s"$root/ckptB", store)
    }
    // a crash between the _committed write and the breadcrumb delete
    // leaves a stale _replaying/<id> that would permanently exempt that
    // id from the high-water guard — start-time GC removes it (the
    // batch is committed, so no in-flight overwrite needs sanctioning)
    fs.mkdirs(new Path(s"$store/_replaying"))
    fs.create(new Path(s"$store/_replaying/1"), true).close()
    BatchStore.bindCheckpoint(spark, s"$root/ckptA", store)
    assert(!fs.exists(new Path(s"$store/_replaying/1")),
      "a committed batch's stale breadcrumb must be GC'd at start")
    // after the GC, an id collision on that id is refused again
    fs.delete(new Path(s"$store/batch=1"), true)
    fs.delete(new Path(s"$store/_committed/1"), false)
    intercept[IllegalStateException] { BatchStore.writeBatch(df, store, 1L) }
  }

  test("empty-frame serving uses the _schema stamp (typed like the non-empty read)") {
    import spark.implicits._
    val root = freshRoot("schema")
    val store = s"$root/store"
    BatchStore.writeBatch(
      Seq(("a", 1L)).toDF("my_id", "n_hits"), store, 0L)
    val nonEmpty = BatchStore.readAll(spark, store).get
    val stored = BatchStore.storedSchema(spark, store).get
    assert(stored.fieldNames.toSeq == Seq("my_id", "n_hits"))
    // the stored stamp + the inferred `batch` partition column together
    // reproduce the non-empty read's column names and types
    assert((stored.map(f => (f.name, f.dataType)) :+
      ("batch", org.apache.spark.sql.types.IntegerType)) ==
      nonEmpty.schema.map(f => (f.name, f.dataType)))
  }

  for (a <- adapters if a.swapDirs("x").nonEmpty) {
    test(s"${a.name}: a swap stranded between renames (.old only) is invisible to the next read") {
      val root = freshRoot(s"${a.name}-old")
      a.ingest(root, 0); a.ingest(root, 1)
      val s = a.state(root)
      val fs = CompactionSwap.fsFor(root,
        spark.sparkContext.hadoopConfiguration)
      a.swapDirs(root).foreach { d =>
        // simulate the crash window between the two renames of a swap:
        // live data exists only under `.old`
        assert(fs.rename(new Path(d), new Path(d + ".old")))
      }
      assert(a.state(root) == s,
        "read-side recovery must roll the stranded .old back")
    }
  }
}
