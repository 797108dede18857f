package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.IncrementalDedup

/** Incremental MinHash-LSH dedup: within-batch detection, detection
  * against the signature store across a STREAM RESTART (the
  * continuously-ingesting-corpus contract), and idempotent batch replay.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val textA = "the quick brown fox jumps over the lazy dog tonight"
  private val textB = "completely different content about databases and storage engines"
  private val textC = "a third unrelated document mentioning spark catalyst optimizer internals"

  private def writeBatch(dir: Path, rows: Seq[(Long, String)]): Unit =
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(dir.toString)

  private def runOnce(inDir: Path, store: Path, dups: Path, ckpt: Path,
                      kept: Option[Path] = None): Unit = {
    val docs = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(inDir.toString)
    val q = IncrementalDedup.run(docs, "doc_id", "text",
      store.toString, dups.toString, ckpt.toString,
      keptDir = kept.map(_.toString))
    q.awaitTermination()
  }

  private def dupSet(dups: Path): Set[(Long, Long, String)] =
    IncrementalDedup.readDuplicates(spark, dups.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("duplicates are found within a batch and, after a restart, against the store") {
    val base = Files.createTempDirectory("graft-incdedup")
    val (in, store, dups, ckpt) =
      (base.resolve("in"), base.resolve("store"), base.resolve("dups"), base.resolve("ckpt"))
    Files.createDirectories(in)

    // batch 1: docs 1 and 3 are exact near-dups (identical text -> identical
    // signatures -> same band keys); doc 2 is unrelated
    writeBatch(in, Seq((1L, textA), (2L, textB), (3L, textA)))
    runOnce(in, store, dups, ckpt)
    assert(dupSet(dups) == Set((3L, 1L, "batch")),
      "within-batch duplicate must pair the later doc against the earlier keeper")

    // stream STOPPED; new file arrives; stream restarts from the checkpoint.
    // doc 4 duplicates doc 1/3 which live only in the signature store now;
    // doc 5 is fresh.
    writeBatch(in, Seq((4L, textA), (5L, textC)))
    runOnce(in, store, dups, ckpt)
    val after2 = dupSet(dups)
    assert(after2.contains((4L, 1L, "store")) && after2.contains((4L, 3L, "store")),
      s"restart must detect the new doc against pre-restart history, got $after2")
    assert(after2 == Set((3L, 1L, "batch"), (4L, 1L, "store"), (4L, 3L, "store")),
      s"no spurious pairs: $after2")

    // idle restart: nothing new, nothing changes
    runOnce(in, store, dups, ckpt)
    assert(dupSet(dups) == after2, "idle restart must not re-emit or duplicate")
  }

  test("kept sink emits the continuously-deduplicated corpus across restarts") {
    val base = Files.createTempDirectory("graft-incdedup-kept")
    val (in, store, dups, ckpt, kept) =
      (base.resolve("in"), base.resolve("store"), base.resolve("dups"),
        base.resolve("ckpt"), base.resolve("kept"))
    Files.createDirectories(in)

    writeBatch(in, Seq((1L, textA), (2L, textB), (3L, textA)))
    runOnce(in, store, dups, ckpt, Some(kept))
    def keptIds(): Set[Long] = spark.read.parquet(kept.toString)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds() == Set(1L, 2L), "within-batch dup 3 dropped, keepers stay")

    // restart: 4 duplicates history (dropped), 5 is fresh (kept)
    writeBatch(in, Seq((4L, textA), (5L, textC)))
    runOnce(in, store, dups, ckpt, Some(kept))
    assert(keptIds() == Set(1L, 2L, 5L),
      "post-restart batch drops the historical dup and keeps the fresh doc")
  }

  test("store compaction bounds batch dirs and detection keeps working after it") {
    val base = Files.createTempDirectory("graft-incdedup-compact")
    val (in, store, dups, ckpt) =
      (base.resolve("in"), base.resolve("store"), base.resolve("dups"), base.resolve("ckpt"))
    Files.createDirectories(in)

    writeBatch(in, Seq((1L, textA), (2L, textB)))
    runOnce(in, store, dups, ckpt)
    writeBatch(in, Seq((3L, textC)))
    runOnce(in, store, dups, ckpt) // two store batch dirs now

    def batchDirs(): Seq[String] =
      Files.list(store).map[String](_.getFileName.toString).toArray
        .map(_.toString).filter(_.startsWith("batch=")).toSeq.sorted
    assert(batchDirs().size == 2, s"expected two batch dirs, got ${batchDirs()}")

    graft.streaming.IncrementalDedup.compactStore(spark, store.toString)
    assert(batchDirs() == Seq("batch=0"), s"compacted to one dir, got ${batchDirs()}")

    // a post-compaction batch must still detect dups against old history
    writeBatch(in, Seq((4L, textA)))
    runOnce(in, store, dups, ckpt)
    assert(dupSet(dups).contains((4L, 1L, "store")),
      "detection against the compacted store must keep working")
  }

  test("a compaction crash between its renames loses no history across a stream restart") {
    val base = Files.createTempDirectory("graft-incdedup-crash")
    val (in, store, dups, ckpt) =
      (base.resolve("in"), base.resolve("store"), base.resolve("dups"), base.resolve("ckpt"))
    Files.createDirectories(in)

    writeBatch(in, Seq((1L, textA), (2L, textB)))
    runOnce(in, store, dups, ckpt)

    // simulate the crash window: the live store was renamed to `.old`,
    // the rewrite never made it into place, the JVM died
    Files.move(store, base.resolve("store.old"))

    // the dedup stream restarts FIRST (before any compaction runs) with a
    // new doc that duplicates pre-crash history — recovery at stream start
    // must make that history visible again
    writeBatch(in, Seq((3L, textA)))
    runOnce(in, store, dups, ckpt)
    assert(dupSet(dups).contains((3L, 1L, "store")),
      "history stranded under .old must be recovered before the restarted stream processes")
    assert(!Files.exists(base.resolve("store.old")), ".old must be consumed by recovery")

    // and a subsequent compaction keeps everything: doc 4 still dups doc 1
    graft.streaming.IncrementalDedup.compactStore(spark, store.toString)
    writeBatch(in, Seq((4L, textA)))
    runOnce(in, store, dups, ckpt)
    assert(dupSet(dups).contains((4L, 1L, "store")),
      "post-recovery compaction must retain the recovered history")
  }

  test("batch replay is idempotent: reprocessing overwrites, never duplicates") {
    val base = Files.createTempDirectory("graft-incdedup-replay")
    val (store, dups) = (base.resolve("store"), base.resolve("dups"))
    val batch = Seq((10L, textA), (11L, textA)).toDF("doc_id", "text")

    // simulate a crash-replay of the same batch id: run it twice
    IncrementalDedup.processBatch(batch, 0L, "doc_id", "text",
      store.toString, dups.toString, n = 3, bands = 4, rowsPerBand = 2)
    IncrementalDedup.processBatch(batch, 0L, "doc_id", "text",
      store.toString, dups.toString, n = 3, bands = 4, rowsPerBand = 2)

    assert(dupSet(dups) == Set((11L, 10L, "batch")), "replay must not duplicate pairs")
    // and the store holds each signature exactly once
    val sigCount = spark.read.parquet(s"$store/batch=0").count()
    assert(sigCount == 2, s"store must hold one signature row per doc, got $sigCount")
  }
}
