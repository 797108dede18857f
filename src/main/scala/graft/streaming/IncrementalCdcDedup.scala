package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.dedup.Dedup

/** Incremental CONTENT-DEFINED-CHUNK deduplication for a continuously-
  * ingesting corpus — the streaming form of [[Dedup.cdcDedupApply]],
  * and the chunk-level sibling of [[IncrementalDedup]] (whole-doc
  * MinHash near-dups) / [[IncrementalEmbedDedup]] (semantic near-dups):
  * each microbatch of documents is rebuilt with every chunk that
  * repeats — within the batch OR anywhere in ingestion history —
  * excised, keeping exactly one canonical copy corpus-wide. Because
  * chunk boundaries are content-defined (FastCDC rationale,
  * [[Dedup.cdcChunks]]), an insertion-shifted re-crawl of an old page
  * still deduplicates past the edit point even when the original was
  * ingested months of batches earlier — the cross-time dedup a
  * training pipeline actually needs (whole-doc hashes miss edited
  * re-crawls; positional spans break at the first insertion).
  *
  * Per batch, via `foreachBatch`:
  *  1. chunk the new docs ([[Dedup.cdcChunks]] — one posexplode + two
  *     same-sort windows + one rollup; batch-sized work);
  *  2. excision set = (a) every batch occurrence of a chunk key
  *     ((chunk_hash, n_tokens)) present in the STORE — the canonical
  *     copy already lives in history — plus (b) the non-first batch
  *     occurrences of keys repeating within the batch
  *     ([[Dedup.cdcDedupApplyFromChunks]]'s window rule);
  *  3. the batch rebuilds through [[Dedup.cutSpans]] (adaptive
  *     broadcast/shuffle anti join) → `cleanDir/batch=<id>` with
  *     per-doc cut stats — the union of clean dirs is the continuously
  *     chunk-deduplicated corpus a training run reads;
  *  4. the batch's NEW canonical chunk keys (first occurrence here,
  *     absent from history) append to `storeDir/batch=<id>` — the
  *     store holds one skinny row per distinct chunk ever seen,
  *     ~corpus/divisor rows, hash-joinable per batch.
  *
  * Exactly-once across restarts: both sinks write one `batch=<id>`
  * subdirectory in overwrite mode and the store lookup reads batches
  * STRICTLY EARLIER than the current id, so a crash replay overwrites
  * its own partial output and never joins against its own half-written
  * keys — [[IncrementalDedup]]'s protocol verbatim. Store growth is
  * bounded by [[compactStore]] (the shared [[CompactionSwap]] dance).
  *
  * Scale shape: per batch the only history-sized work is one equi-join
  * of the batch's chunk keys against the store (an index lookup on
  * (chunk_hash, n_tokens) — never a text scan of history), and the
  * store row is two longs, and the join's output is contracted to the
  * batch's hit keys in that single scan; everything else is
  * batch-sized. Nothing quadratic at any corpus size.
  */
object IncrementalCdcDedup {

  def run(docs: DataFrame, idCol: String, textCol: String,
          storeDir: String, cleanDir: String, checkpointDir: String,
          k: Int = 4, divisor: Long = 16L): StreamingQuery = {
    // recover a compaction that crashed between its renames (history
    // stranded under `.old`) BEFORE the stream recreates the store dir
    BatchStore.bindCheckpoint(docs.sparkSession, checkpointDir,
      storeDir, cleanDir)
    docs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // per-batch identity re-check (see BatchStore.ensureBound)
        BatchStore.ensureBound(batch.sparkSession, checkpointDir,
          storeDir, cleanDir)
        processBatch(batch, batchId, idCol, textCol, storeDir, cleanDir,
          k, divisor)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** One microbatch: chunk, cut, persist. Factored out of the stream
    * for direct unit testing (crash replays = call twice, same id).
    */
  def processBatch(batch: Dataset[Row], batchId: Long, idCol: String,
                   textCol: String, storeDir: String, cleanDir: String,
                   k: Int, divisor: Long): Unit = {
    val spark = batch.sparkSession
    // folded-batch replay guard ([[IncrementalDedup.processBatch]]'s
    // rationale): a replay after the fold would find its own canonical
    // chunk keys in batch=0 and excise every chunk of its own docs. The
    // clean sink is written before the store below, so the skip is
    // lossless.
    if (BatchStore.isFolded(spark, storeDir, batchId)) return
    val b = batch.toDF()
    // within-batch canonical pick: first occurrence in (id, chunk_start)
    // keeps, later occurrences of a repeating key cut — byte-for-byte
    // cdcDedupApplyFromChunks' rule, so a single-batch stream equals the
    // batch operator (spec-pinned). Checkpointed AFTER the windows, not
    // at the chunk table: `ranked` has three consumers (store-hit
    // excision, within-batch excision, canonical append) and an
    // uncheckpointed plan would re-run the two window passes per
    // consumer.
    val wCanon = Window.partitionBy("chunk_hash", "n_tokens")
      .orderBy(col(idCol), col("chunk_start"))
    val ranked = Dedup.cdcChunks(b, idCol, textCol, k, divisor)
      .withColumn("__rn", row_number().over(wCanon))
      .withColumn("__occ", count(lit(1)).over(
        Window.partitionBy("chunk_hash", "n_tokens")))
      .localCheckpoint(true)

    // store lookup strictly below the current batch id (replay-safe),
    // contracted to the BATCH's hit keys in ONE history scan — the
    // semi-join result is batch-keys-sized, so checkpointing it lets
    // both the excision pick and the canonical anti-join reuse it
    // without a second pass over the (corpus/divisor-sized) store
    val priorBatches = BatchStore.listPriorBatches(spark, storeDir, batchId)
    val hitKeys = (
      if (priorBatches.isEmpty)
        ranked.select("chunk_hash", "n_tokens").limit(0)
      else ranked.select("chunk_hash", "n_tokens").distinct()
        .join(spark.read.parquet(priorBatches: _*)
          .select("chunk_hash", "n_tokens"),
          Seq("chunk_hash", "n_tokens"), "left_semi")
      ).localCheckpoint(true)

    // excise: all store-hit occurrences (canonical is historical) plus
    // the non-first occurrences of within-batch repeats; one occurrence
    // can match both rules — distinct on the occurrence key
    val excised = ranked
      .join(hitKeys, Seq("chunk_hash", "n_tokens"), "left_semi")
      .select(col(idCol),
        col("chunk_start").as("span_start"),
        col("chunk_end").as("span_end"), col("n_tokens"))
      .union(ranked.filter(col("__occ") >= 2 && col("__rn") >= 2)
        .select(col(idCol), col("chunk_start").as("span_start"),
          col("chunk_end").as("span_end"), col("n_tokens")))
      .distinct()
      .localCheckpoint(true) // feeds cutSpans (count + join) and stats

    val stats = excised.groupBy(idCol)
      .agg(count(lit(1)).as("n_cut_chunks"),
        sum("n_tokens").as("n_cut_tokens"))
    BatchStore.writeBatch(
      Dedup.cutSpans(b, excised.drop("n_tokens"), idCol, textCol)
        .join(stats, Seq(idCol), "left")
        .select(col(idCol), col("clean_text"),
          coalesce(col("n_cut_chunks"), lit(0L)).as("n_cut_chunks"),
          coalesce(col("n_cut_tokens"), lit(0L)).as("n_cut_tokens")),
      cleanDir, batchId)

    // the batch's new canonical keys: first batch occurrence, not in
    // history — the store stays one skinny row per distinct chunk ever
    BatchStore.writeBatch(
      ranked.filter(col("__rn") === 1)
        .join(hitKeys, Seq("chunk_hash", "n_tokens"), "left_anti")
        .select("chunk_hash", "n_tokens"),
      storeDir, batchId)

    graft.util.Pins.release(ranked)
    graft.util.Pins.release(hitKeys)
    graft.util.Pins.release(excised)
  }

  /** The continuously-deduplicated corpus so far (any batch). */
  def readClean(spark: SparkSession, cleanDir: String): DataFrame =
    spark.read.parquet(cleanDir)

  /** Compact the chunk-key store into a single `batch=0` (distinct fold
    * — concurrent first-appearances across uncompacted batches collapse
    * to one row), bounding file growth for a long-lived stream. Batch 0
    * sorts below every live microbatch id, so the strictly-earlier
    * lookup rule keeps holding. Single-writer contract: stop the stream
    * first ([[IncrementalDedup.compactStore]]'s contract).
    */
  def compactStore(spark: SparkSession, storeDir: String): Unit =
    BatchStore.compact(spark, storeDir) { (batches, batch0) =>
      spark.read.parquet(batches: _*).distinct()
        .write.mode("overwrite").parquet(batch0)
    }
}
