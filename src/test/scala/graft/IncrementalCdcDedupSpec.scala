package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.IncrementalCdcDedup

/** Streaming chunk-level dedup: single-batch parity with the batch
  * operator, cross-batch dedup of an insertion-shifted re-crawl against
  * the chunk-key store (the FastCDC property across TIME, not just
  * within a corpus), crash-replay idempotence, store-hit × within-batch
  * interplay, and compaction keeping history visible.
  */
class IncrementalCdcDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // the DedupSpec CDC fixture: a long non-repeating token sequence
  // (period lcm(97, 13) > 400), so a single doc has no internal
  // repeated chunks and any cut is genuine cross-doc/cross-batch dedup
  private val words = (0 until 400).map(i => s"w${(i * 37 + 11) % 97}x${i % 13}")
  private val baseText = words.mkString(" ")

  private def dirs(): (String, String) = {
    val base = Files.createTempDirectory("graft-cdcinc")
    (base.resolve("store").toString, base.resolve("clean").toString)
  }

  private def process(docs: Seq[(Long, String)], id: Long,
                      store: String, clean: String): Unit =
    IncrementalCdcDedup.processBatch(docs.toDF("doc_id", "text"), id,
      "doc_id", "text", store, clean, k = 4, divisor = 16L)

  private def cleanRows(clean: String, id: Long): Map[Long, (String, Long, Long)] =
    spark.read.parquet(s"$clean/batch=$id").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("a single batch equals the batch operator (cdcDedupApply parity)") {
    val (store, clean) = dirs()
    val docs = Seq((1L, baseText), (2L, "inserted " + baseText))
    process(docs, 0L, store, clean)
    val got = cleanRows(clean, 0L)
    val want = graft.dedup.Dedup.cdcDedupApply(
        docs.toDF("doc_id", "text"), "doc_id", "text", k = 4, divisor = 16L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == want,
      "an empty-history batch must reproduce the batch operator exactly")
  }

  test("cross-batch: an insertion-shifted re-crawl deduplicates against old history") {
    val (store, clean) = dirs()
    process(Seq((1L, baseText)), 0L, store, clean)
    val (clean0, cut0, cutToks0) = cleanRows(clean, 0L)(1L)
    assert(cut0 == 0L && cutToks0 == 0L && clean0 == baseText,
      "the first ingest of unique content passes through verbatim")

    // a later batch ingests the same page, edited at the front: every
    // position shifts, but the content-defined chunks past the first
    // re-aligned boundary hash identically to the STORED keys
    process(Seq((2L, "inserted " + baseText)), 1L, store, clean)
    val (clean1, cut1, cutToks1) = cleanRows(clean, 1L)(2L)
    assert(cut1 >= 3, s"expected several excised chunks, got $cut1")
    assert(cutToks1 >= 300L,
      s"most shared tokens must dedup across the batch boundary, got $cutToks1")
    assert(clean1.startsWith("inserted "), "the edit itself must survive")
    assert(clean1.split("\\s+").count(_.nonEmpty) + cutToks1 == 401L,
      "kept + cut must account for every token")
  }

  test("crash replay converges: clean output identical, store keys never duplicate") {
    val (store, clean) = dirs()
    process(Seq((1L, baseText)), 0L, store, clean)
    process(Seq((2L, "inserted " + baseText)), 1L, store, clean)
    val firstClean = cleanRows(clean, 1L)
    val storeKeys = spark.read.parquet(store).count()
    // replay batch 1 (crash after outputs, before the engine committed
    // its checkpoint): overwrite semantics converge both sinks
    process(Seq((2L, "inserted " + baseText)), 1L, store, clean)
    assert(cleanRows(clean, 1L) == firstClean, "replayed clean output must be identical")
    assert(spark.read.parquet(store).count() == storeKeys,
      "a replay must not grow the store")
    val distinctKeys = spark.read.parquet(store)
      .select("chunk_hash", "n_tokens").distinct().count()
    assert(distinctKeys == storeKeys,
      "the store must hold one row per distinct chunk key")
  }

  test("store-hit plus within-batch repeat: every later occurrence cuts") {
    val (store, clean) = dirs()
    process(Seq((1L, baseText)), 0L, store, clean)
    // the new doc repeats the HISTORICAL content twice: the store rule
    // cuts every occurrence of stored keys (canonical lives in batch 0),
    // and the within-batch rule adds nothing new on top — near-total cut
    process(Seq((2L, baseText + " " + baseText)), 1L, store, clean)
    val (cleanB, _, cutToks) = cleanRows(clean, 1L)(2L)
    assert(cutToks >= 600L,
      s"both copies of stored content must cut, got $cutToks")
    assert(cleanB.split("\\s+").count(_.nonEmpty) + cutToks == 800L)
  }

  test("the streaming runner dedups an edited re-crawl across restarts") {
    val base = Files.createTempDirectory("graft-cdcinc-run")
    val (in, store, clean, ckpt) = (base.resolve("in"),
      base.resolve("store").toString, base.resolve("clean").toString,
      base.resolve("ckpt").toString)
    Files.createDirectories(in)
    def runOnce(): Unit =
      IncrementalCdcDedup.run(
        spark.readStream.schema("doc_id LONG, text STRING").parquet(in.toString),
        "doc_id", "text", store, clean, ckpt, k = 4, divisor = 16L)
        .awaitTermination()
    Seq((1L, baseText)).toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(in.toString)
    runOnce()
    Seq((2L, "inserted " + baseText)).toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(in.toString)
    runOnce()
    val all = IncrementalCdcDedup.readClean(spark, clean).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    assert(all(1L)._1 == baseText && all(1L)._2 == 0L,
      "first ingest passes through")
    assert(all(2L)._2 >= 300L,
      s"the restarted stream must dedup against batch-0 history, got ${all(2L)._2}")
  }

  test("compaction folds history into batch=0 and dedup still sees it") {
    val (store, clean) = dirs()
    process(Seq((1L, baseText)), 0L, store, clean)
    process(Seq((2L, "unrelated " * 50)), 1L, store, clean)
    IncrementalCdcDedup.compactStore(spark, store)
    val fs = graft.streaming.CompactionSwap.fsFor(store,
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$store/batch=0")))
    // a post-compaction batch re-ingesting batch-0 content still dedups
    process(Seq((3L, baseText)), 5L, store, clean)
    val (_, cut, cutToks) = cleanRows(clean, 5L)(3L)
    assert(cut >= 3 && cutToks >= 300L,
      s"compacted history must stay visible to dedup, got ($cut, $cutToks)")
  }
}
