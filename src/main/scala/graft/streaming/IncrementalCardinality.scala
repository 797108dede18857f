package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental cardinality for a continuously-ingesting event stream: a
  * persistent store of per-day HLL sketches maintained per microbatch, so
  * "distinct users today / this week / ever" is answered by merging a few
  * KB of sketch state — history is NEVER rescanned (the streaming
  * counterpart of the declared `ev_users_hll_merge` batch query, and the
  * sketch analogue of [[EventsStream]]'s upsert log).
  *
  * Per batch, via `foreachBatch`: one aggregation of the batch into
  * (day, sketch) rows, appended as an idempotent `batch=<id>` subdirectory
  * (`overwrite` mode — a crash-replayed batch overwrites its own partial
  * output instead of double-counting; HLL insertion is idempotent anyway,
  * but the subdir layout keeps the store's file set deterministic).
  *
  * Serving reads union the per-batch day rows with `hll_union_agg` —
  * lossless at equal lgConfigK, order-independent — and periodic
  * [[compactStore]] folds every `batch=` subdir into one `batch=0`
  * (crash-safe swap, same contract as the dedup signature store): after
  * compaction the store holds exactly one row per day regardless of how
  * many batches ever ran.
  */
object IncrementalCardinality {

  /** Start the sketch maintenance over a streaming events frame. */
  def run(events: DataFrame, keyCol: String, tsCol: String,
          storeDir: String, checkpointDir: String,
          lgConfigK: Int = 14): StreamingQuery = {
    val conf = events.sparkSession.sparkContext.hadoopConfiguration
    CompactionSwap.recoverDanglingOld(CompactionSwap.fsFor(storeDir, conf), storeDir)
    events.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch, batchId, keyCol, tsCol, storeDir, lgConfigK)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** One microbatch: aggregate to per-day sketches and persist. Factored
    * out of the stream for direct unit testing (and crash-replay tests).
    */
  def processBatch(batch: Dataset[Row], batchId: Long, keyCol: String,
                   tsCol: String, storeDir: String, lgConfigK: Int): Unit =
    batch.toDF()
      .groupBy(date_trunc("day", col(tsCol)).as("day_ts"))
      .agg(hll_sketch_agg(col(keyCol), lit(lgConfigK)).as("sk"))
      .write.mode("overwrite").parquet(s"$storeDir/batch=$batchId")

  /** Distinct-key estimate per day, merging every batch's sketches. */
  def readDailyEstimates(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(storeDir)
      .groupBy("day_ts")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(true)))
        .as("est_keys"))

  /** Global distinct-key estimate across all days and batches. */
  def readTotalEstimate(spark: SparkSession, storeDir: String): Long =
    spark.read.parquet(storeDir)
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(true))))
      .head.getLong(0)

  /** Fold all `batch=*` subdirs into one `batch=0` holding exactly one
    * merged sketch row per day. Batch 0 sorts below every live microbatch
    * id, and the union is lossless, so estimates are unchanged.
    */
  def compactStore(spark: SparkSession, storeDir: String): Unit =
    BatchStore.compact(spark, storeDir) { (batches, outDir) =>
      spark.read.parquet(batches: _*)
        .groupBy("day_ts")
        .agg(hll_union_agg(col("sk"), lit(true)).as("sk"))
        .write.mode("overwrite").parquet(outDir)
    }
}
