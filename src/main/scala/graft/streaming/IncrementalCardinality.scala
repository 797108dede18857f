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
    BatchStore.bindCheckpoint(events.sparkSession, checkpointDir, storeDir)
    events.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // per-batch identity re-check (see BatchStore.ensureBound)
        BatchStore.ensureBound(batch.sparkSession, checkpointDir, storeDir)
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
                   tsCol: String, storeDir: String, lgConfigK: Int): Unit = {
    // folded-batch replay guard: HLL insertion is idempotent, but a
    // replay after the fold would re-ADD the batch as a new dir next to
    // batch=0 — harmless for estimates, yet the store's file set would
    // diverge from the never-compacted twin (the contract every sibling
    // store keeps)
    if (BatchStore.isFolded(batch.sparkSession, storeDir, batchId)) return
    BatchStore.writeBatch(
      batch.toDF()
        .groupBy(date_trunc("day", col(tsCol)).as("day_ts"))
        .agg(hll_sketch_agg(col(keyCol), lit(lgConfigK)).as("sk")),
      storeDir, batchId)
  }

  // graceful-empty serving (the readTopK contract the other stores
  // follow): a store that doesn't exist yet, or whose first batch
  // crashed before any parquet footer committed, serves zeros/empties
  // instead of throwing mid-incident — the shared [[BatchStore.readAll]]
  // contract (which also recovers a stranded compaction first)
  private def store(spark: SparkSession, storeDir: String): Option[DataFrame] =
    BatchStore.readAll(spark, storeDir)

  /** Distinct-key estimate per day, merging every batch's sketches. */
  def readDailyEstimates(spark: SparkSession, storeDir: String): DataFrame =
    store(spark, storeDir).fold(
      spark.range(0).select(lit(null).cast("timestamp").as("day_ts"),
        lit(0L).as("est_keys")))(
      _.groupBy("day_ts")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(true)))
          .as("est_keys")))

  /** Global distinct-key estimate across all days and batches. */
  def readTotalEstimate(spark: SparkSession, storeDir: String): Long =
    store(spark, storeDir).fold(0L)(
      _.agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(true))))
        .head.getLong(0))

  /** Rolling DAU/WAU/MAU served FROM THE SKETCH STORE — the streaming
    * completion of the batch `ev_active_users` query: one row per active
    * day with the 1/7/30-day trailing distinct-user estimates, computed
    * by merging per-day sketches (a few KB each) instead of rescanning
    * events. Same scale shape as the batch query: each trailing window is
    * a map-side explode of window-end offsets into a partial-aggregated
    * sketch union keyed by window end — an equi-aggregation, never a
    * days × activity range join — and the per-day contraction is served
    * from one checkpointed pass. Phantom window ends past the last
    * active day drop at the inner join with the day set. HLL unions are
    * lossless at equal lgConfigK, so serving after [[compactStore]]
    * returns identical estimates.
    */
  def readActiveUsers(spark: SparkSession, storeDir: String): DataFrame = {
    store(spark, storeDir) match {
      case None => return spark.range(0).select(
        lit(null).cast("date").as("day"), lit(0L).as("dau_est"),
        lit(0L).as("wau_est"), lit(0L).as("mau_est"))
      case Some(_) => ()
    }
    val daily = spark.read.parquet(storeDir)
      .groupBy(to_date(col("day_ts")).as("day"))
      .agg(hll_union_agg(col("sk"), lit(true)).as("sk"))
      .localCheckpoint(true) // three window rollups serve from one pass
    try {
      def trailing(n: Int, name: String) = daily
        .select(explode(sequence(lit(0), lit(n - 1))).as("off"),
          col("day"), col("sk"))
        .select(date_add(col("day"), col("off")).as("day"), col("sk"))
        .groupBy("day")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(true))).as(name))
      val dau = daily.select(col("day"),
        hll_sketch_estimate(col("sk")).as("dau_est"))
      // days-sized serving table: local materialization inside the pin's
      // lifetime (activeUsers' contract) — nothing stays pinned after
      // the call
      val plan = dau.join(trailing(7, "wau_est"), "day")
        .join(trailing(30, "mau_est"), "day")
        .select("day", "dau_est", "wau_est", "mau_est")
      val rows = plan.collect()
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), plan.schema)
    } finally graft.util.Pins.release(daily)
  }

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
