package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.dedup.Dedup

/** Incremental MinHash-LSH deduplication for a continuously-ingesting
  * corpus: each microbatch of documents is checked for near-duplicates
  * BOTH within itself and against a persistent signature store of every
  * previously ingested document — the shape a streaming training-data
  * pipeline needs (`dropDuplicatesWithinWatermark` only covers exact ids
  * inside the watermark horizon; this covers near-dups across all time).
  *
  * Per batch, via `foreachBatch`:
  *  1. MinHash signatures for the new docs (one shuffle over the batch);
  *  2. within-batch LSH candidate pairs (band-key equi-self-join);
  *  3. new-vs-store candidate pairs (band-key equi-join against the
  *     store — an index lookup, not a corpus scan: cost scales with the
  *     batch, not with history);
  *  4. duplicates appended to `dupDir`, signatures appended to
  *     `storeDir`.
  *
  * Exactly-once across restarts: both sinks write one subdirectory per
  * microbatch (`batch=<id>`) with `overwrite` mode, so a batch replayed
  * after a crash overwrites its own previous (possibly partial) output
  * instead of duplicating it, and the store lookup only reads batches
  * strictly earlier than the current one — a replay can never join
  * against its own half-written signatures.
  *
  * At 100 TB the store is the natural LSH index layout: signatures are
  * tiny (numHashes hex strings per doc) and the band join hash-partitions
  * on band keys; periodic compaction of the `batch=` subdirs (same
  * pattern as [[EventsStream.compactUpsertLog]]) bounds file counts.
  */
object IncrementalDedup {

  /** Start the incremental dedup over a streaming (idCol, textCol) frame.
    * `docs` must be a streaming DataFrame (e.g. a parquet file source).
    * With `keptDir` set, each batch also writes its CLEANED slice — the
    * rows that duplicate neither the batch nor any earlier history — so
    * the kept dirs union is the continuously-deduplicated corpus a
    * training run reads (the streaming counterpart of `tp_corpus_clean`'s
    * dedup stage), with the same idempotent batch-subdir layout.
    */
  def run(docs: DataFrame, idCol: String, textCol: String,
          storeDir: String, dupDir: String, checkpointDir: String,
          n: Int = 3, bands: Int = 4, rowsPerBand: Int = 2,
          keptDir: Option[String] = None): StreamingQuery = {
    // a compaction that crashed between its renames leaves history only
    // under `.old`; recover it BEFORE the stream recreates the store dir,
    // or every historical duplicate is invisible to the restarted stream
    // bindCheckpoint = the recovery hook + the checkpoint-identity
    // guard (a fresh checkpoint against this store would collide ids)
    BatchStore.bindCheckpoint(docs.sparkSession, checkpointDir,
      Seq(storeDir, dupDir) ++ keptDir: _*)
    docs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // per-batch identity re-check: binds atomically with the first
        // batch and catches a deleted-and-recreated checkpoint (fresh
        // query id) before any same-id overwrite or folded-id skip
        BatchStore.ensureBound(batch.sparkSession, checkpointDir,
          Seq(storeDir, dupDir) ++ keptDir: _*)
        processBatch(batch, batchId, idCol, textCol,
          storeDir, dupDir, n, bands, rowsPerBand, keptDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** One microbatch: detect + persist. Factored out of the stream for
    * direct unit testing.
    */
  def processBatch(batch: Dataset[Row], batchId: Long, idCol: String,
                   textCol: String, storeDir: String, dupDir: String,
                   n: Int, bands: Int, rowsPerBand: Int,
                   keptDir: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    // a batch already FOLDED into batch=0 must not replay: its batch dir
    // no longer exists, so re-running would both duplicate its
    // signatures in the store and recompute its pairs against a history
    // that now contains its own folded signatures (every batch doc would
    // flag as a store dup of itself). All sink writes below land BEFORE
    // the store write whose commit marker gates the fold, so a folded
    // batch's dup/kept output is guaranteed already on disk.
    if (BatchStore.isFolded(spark, storeDir, batchId)) return
    val sigs = Dedup
      .minhashSignatures(batch.toDF(), idCol, textCol, n, bands * rowsPerBand)
      .localCheckpoint(true) // feeds band rows AND the store append
    val newBands = Dedup.minhashBandRows(sigs, idCol, bands, rowsPerBand)

    val withinPairs = {
      val a = newBands.select(col("band"), col("band_key"), col(idCol).as("new_id"))
      val b = newBands.select(col("band"), col("band_key"), col(idCol).as("dup_of"))
      a.join(b, Seq("band", "band_key"))
        .filter(col("dup_of") < col("new_id")) // the earlier id is the keeper
        .select(col("new_id"), col("dup_of"), lit("batch").as("src"))
    }

    // store lookup strictly below the current batch id: idempotent on replay
    val priorBatches = listPriorBatches(spark, storeDir, batchId)
    val storePairs =
      if (priorBatches.isEmpty) withinPairs.limit(0)
      else {
        val store = spark.read.parquet(priorBatches: _*)
        val storeBands = Dedup.minhashBandRows(store, idCol, bands, rowsPerBand)
          .select(col("band"), col("band_key"), col(idCol).as("dup_of"))
        newBands.select(col("band"), col("band_key"), col(idCol).as("new_id"))
          .join(storeBands, Seq("band", "band_key"))
          .filter(col("new_id") =!= col("dup_of"))
          .select(col("new_id"), col("dup_of"), lit("store").as("src"))
      }

    // fresh aliases on both union inputs (Spark 4 Union constraint quirk)
    val dups = withinPairs
      .select(col("new_id").as("new_id"), col("dup_of").as("dup_of"), col("src").as("src"))
      .union(storePairs
        .select(col("new_id").as("new_id"), col("dup_of").as("dup_of"), col("src").as("src")))
      .distinct()

    // duplicates must be materialized before the kept anti-join below —
    // both consume the same band-join plans
    val dupsOut = dups.localCheckpoint(true)
    BatchStore.writeBatch(dupsOut, dupDir, batchId)
    keptDir.foreach { kd =>
      val b = batch.toDF()
      val dupIds = dupsOut.select(col("new_id"))
      BatchStore.writeBatch(
        b.join(dupIds, b(idCol) === dupIds("new_id"), "left_anti"),
        kd, batchId)
    }
    // the compacted store is written LAST: its commit marker is what
    // licenses the fold (and so the replay skip above), and the skip is
    // lossless only if every sink write already happened
    BatchStore.writeBatch(sigs, storeDir, batchId)

    // checkpointed microbatch state is consumed by now — without the
    // release a long-running stream accumulates one pinned RDD pair
    // per microbatch in executor storage
    graft.util.Pins.release(sigs)
    graft.util.Pins.release(dupsOut)
  }

  // safe mid-stream: the single-writer contract means no compaction can
  // race the recovery inside the shared listing
  private def listPriorBatches(spark: SparkSession, storeDir: String,
                               batchId: Long): Seq[String] =
    BatchStore.listPriorBatches(spark, storeDir, batchId)

  /** All duplicate records detected so far (any batch). */
  def readDuplicates(spark: SparkSession, dupDir: String): DataFrame =
    spark.read.parquet(dupDir).select("new_id", "dup_of", "src")

  /** Compact the signature store: merge every `batch=*` subdirectory into
    * a single `batch=0`, bounding directory/file growth for a long-lived
    * stream. Batch 0 sorts below every live microbatch id, so the
    * `strictly earlier` store-lookup rule keeps holding after compaction.
    *
    * Single-writer contract: stop the dedup stream first (same contract
    * as [[EventsStream.compactUpsertLog]]). The swap is the shared
    * crash-recoverable three-step dance ([[CompactionSwap.swap]]); a
    * dangling `.old` from an interrupted swap is recovered here, at
    * stream start, and at every store lookup — even if the stream
    * restarted and recreated the store in between, the pre-compaction
    * history is folded back in, never deleted.
    */
  def compactStore(spark: SparkSession, storeDir: String): Unit =
    BatchStore.compact(spark, storeDir) { (batches, batch0) =>
      spark.read.parquet(batches: _*)
        .write.mode("overwrite").parquet(batch0)
    }
}
