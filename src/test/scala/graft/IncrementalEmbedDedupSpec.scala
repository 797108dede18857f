package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.IncrementalEmbedDedup

/** Incremental embedding near-dup: within-batch detection, detection
  * against the bucket-partitioned vector store across a STREAM RESTART,
  * idempotent batch replay, and post-compaction detection. A positively
  * scaled copy of a vector has cosine 1 AND lands in the same SRP
  * bucket deterministically (sign(dot) is scale-invariant), so the
  * fixtures need no knowledge of the seeded planes.
  */
class IncrementalEmbedDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dim = 8
  private val vecA = Seq(1.0, 0.5, -0.25, 2.0, 0.0, -1.0, 0.75, 0.1)
  private val vecA2 = vecA.map(_ * 3.0)             // cosine 1, same bucket
  private val vecB = Seq(-2.0, 1.0, 3.0, -0.5, 1.5, 0.25, -1.0, 2.0)
  private val vecC = Seq(0.1, -3.0, 0.5, 1.0, -2.0, 0.75, 2.5, -0.25)

  private def writeBatch(dir: Path, rows: Seq[(Long, Seq[Double])]): Unit =
    rows.toDF("vec_id", "embedding").coalesce(1)
      .write.mode("append").parquet(dir.toString)

  private def runOnce(in: Path, store: Path, dups: Path, ckpt: Path,
                      kept: Option[Path] = None): Unit = {
    val vecs = spark.readStream.schema("vec_id LONG, embedding ARRAY<DOUBLE>")
      .parquet(in.toString)
    val q = IncrementalEmbedDedup.run(vecs, "vec_id", "embedding",
      store.toString, dups.toString, ckpt.toString,
      threshold = 0.9, numPlanes = 4, dim = dim,
      keptDir = kept.map(_.toString))
    q.awaitTermination()
  }

  private def dupSet(dups: Path): Set[(Long, Long, String)] =
    IncrementalEmbedDedup.readDuplicates(spark, dups.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet

  test("near-dups found within a batch and, after restart, against the store") {
    val base = Files.createTempDirectory("graft-embdedup")
    val (in, store, dups, ckpt) =
      (base.resolve("in"), base.resolve("store"), base.resolve("dups"), base.resolve("ckpt"))
    Files.createDirectories(in)

    // batch 1: 3 is a scaled copy of 1 (cosine 1); 2 is unrelated
    writeBatch(in, Seq((1L, vecA), (2L, vecB), (3L, vecA2)))
    runOnce(in, store, dups, ckpt)
    assert(dupSet(dups) == Set((3L, 1L, "batch")),
      "within-batch near-dup must pair the later vector against the earlier keeper")

    // restart: 4 duplicates history (store hit), 5 is fresh
    writeBatch(in, Seq((4L, vecA2), (5L, vecC)))
    runOnce(in, store, dups, ckpt)
    val after = dupSet(dups)
    assert(after.contains((4L, 1L, "store")) && after.contains((4L, 3L, "store")),
      s"restart must detect against pre-restart history, got $after")
    assert(after == Set((3L, 1L, "batch"), (4L, 1L, "store"), (4L, 3L, "store")),
      s"no spurious pairs: $after")

    // idle restart: nothing new, nothing re-emitted
    runOnce(in, store, dups, ckpt)
    assert(dupSet(dups) == after)

    // cosine rides along and is 1.0 for the scaled copies
    val cos = IncrementalEmbedDedup.readDuplicates(spark, dups.toString)
      .collect().map(_.getDouble(2))
    assert(cos.forall(c => c > 0.999))
  }

  test("zero-norm vectors are never flagged as near-dups (NaN cosine guard)") {
    val base = Files.createTempDirectory("graft-embdedup-zero")
    val (in, store, dups, ckpt) =
      (base.resolve("in"), base.resolve("store"), base.resolve("dups"), base.resolve("ckpt"))
    Files.createDirectories(in)
    val zero = Seq.fill(dim)(0.0)
    // two zero vectors + one real vector in one batch: with NaN >= threshold
    // being TRUE under Spark's NaN-largest ordering, an unguarded join
    // would pair the zero vectors with every bucket-mate
    writeBatch(in, Seq((1L, vecA), (2L, zero), (3L, zero)))
    runOnce(in, store, dups, ckpt)
    assert(dupSet(dups).isEmpty,
      s"zero-norm vectors must not produce dup pairs, got ${dupSet(dups)}")
    // and a zero vector arriving later must not match the STORED zeros
    writeBatch(in, Seq((4L, zero)))
    runOnce(in, store, dups, ckpt)
    assert(dupSet(dups).isEmpty,
      s"stored zero-norm vectors must not produce dup pairs, got ${dupSet(dups)}")
  }

  test("store compaction preserves detection and the bucket layout") {
    val base = Files.createTempDirectory("graft-embdedup-compact")
    val (in, store, dups, ckpt) =
      (base.resolve("in"), base.resolve("store"), base.resolve("dups"), base.resolve("ckpt"))
    Files.createDirectories(in)

    writeBatch(in, Seq((1L, vecA), (2L, vecB)))
    runOnce(in, store, dups, ckpt)
    writeBatch(in, Seq((10L, vecC)))
    runOnce(in, store, dups, ckpt)

    IncrementalEmbedDedup.compactStore(spark, store.toString)
    // underscore-prefixed marker dirs (_folded/_committed — the round-17
    // fold bookkeeping) are protocol metadata, invisible to parquet
    // readers; the layout contract is about BATCH dirs
    val sub = store.toFile.listFiles()
      .filter(f => f.isDirectory && !f.getName.startsWith("_"))
      .map(_.getName).toSet
    assert(sub == Set("batch=0"), s"compaction must leave one batch dir: $sub")
    assert(store.resolve("batch=0").toFile.listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("bucket=")),
      "bucket partitioning must survive compaction")

    // new batch still detects against the COMPACTED history
    writeBatch(in, Seq((20L, vecA2)))
    runOnce(in, store, dups, ckpt)
    val after = dupSet(dups)
    assert(after.contains((20L, 1L, "store")),
      s"post-compaction store hit missing: $after")
  }

  test("kept sink emits the deduplicated vector stream") {
    val base = Files.createTempDirectory("graft-embdedup-kept")
    val (in, store, dups, ckpt, kept) =
      (base.resolve("in"), base.resolve("store"), base.resolve("dups"),
        base.resolve("ckpt"), base.resolve("kept"))
    Files.createDirectories(in)

    writeBatch(in, Seq((1L, vecA), (2L, vecB), (3L, vecA2)))
    runOnce(in, store, dups, ckpt, Some(kept))
    def keptIds(): Set[Long] = spark.read.parquet(kept.toString)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(keptIds() == Set(1L, 2L), "scaled-copy 3 dropped, keepers stay")

    writeBatch(in, Seq((4L, vecA2), (5L, vecC)))
    runOnce(in, store, dups, ckpt, Some(kept))
    assert(keptIds() == Set(1L, 2L, 5L), "store-dup 4 dropped, fresh 5 kept")
  }
}
