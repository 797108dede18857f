package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.dedup.Dedup

/** Streaming benchmark decontamination: every microbatch of a
  * continuously-ingesting corpus is checked for n-gram overlap with a
  * STATIC held-out eval set (the streaming counterpart of
  * [[graft.dedup.Dedup.decontaminate]]), flagged docs land in an
  * idempotent per-batch sink. Unlike [[IncrementalDedup]] the reference
  * side never grows — the benchmark's distinct shingles are materialized
  * once at stream start and broadcast into every batch's semi-join, so
  * per-batch cost scales with the batch alone (no store, no compaction).
  *
  * Exactly-once across restarts: the sink writes one `batch=<id>`
  * subdirectory per microbatch with `overwrite` mode — a batch replayed
  * after a crash overwrites its own previous (possibly partial) output
  * instead of duplicating it, the same contract [[IncrementalDedup]]'s
  * sinks carry.
  */
object StreamingDecontaminate {

  /** Start the decontamination stream over a streaming (idCol, textCol)
    * frame; `benchmark` is a BATCH frame (the eval set). Flagged docs —
    * `(idCol, n_hits, batch_id)` with `n_hits >= 1` — append under
    * `flaggedDir/batch=<id>/`.
    */
  def run(docs: DataFrame, benchmark: DataFrame, idCol: String,
          textCol: String, flaggedDir: String, checkpointDir: String,
          n: Int = 3): StreamingQuery = {
    // checkpoint-identity guard: a fresh checkpoint restarts batch ids
    // at 0 and would silently overwrite the flagged history
    BatchStore.bindCheckpoint(docs.sparkSession, checkpointDir, flaggedDir)
    // eval sets are small and frozen: one shingle pass at stream start,
    // eagerly materialized, reused by every microbatch
    val benchShingles = Dedup.shingles(benchmark, idCol, textCol, n)
      .select("shingle").distinct().localCheckpoint(true)
    docs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // per-batch identity re-check (see BatchStore.ensureBound)
        BatchStore.ensureBound(batch.sparkSession, checkpointDir, flaggedDir)
        processBatch(batch.toDF(), batchId, benchShingles, idCol, textCol,
          flaggedDir, n)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** One microbatch: shingle the batch, broadcast-semi-join the benchmark
    * set, write per-doc hit counts idempotently. Factored out of the
    * stream for direct unit testing.
    */
  def processBatch(batch: DataFrame, batchId: Long, benchShingles: DataFrame,
                   idCol: String, textCol: String, flaggedDir: String,
                   n: Int): Unit = {
    BatchStore.writeBatch(
      Dedup.shingles(batch, idCol, textCol, n)
        .join(broadcast(benchShingles), Seq("shingle"), "left_semi")
        .groupBy(idCol)
        .agg(count(lit(1)).as("n_hits"))
        .withColumn("batch_id", lit(batchId)),
      flaggedDir, batchId)
  }

  /** Read back every batch's flagged docs as one frame. Graceful on an
    * absent or torn (no committed footer) sink — the shared
    * [[BatchStore.readAll]] contract; serving before the first batch
    * lands returns an empty frame, not a schema-inference throw. The
    * empty frame's schema comes from the sink's `_schema` marker
    * (stamped by the first committed batch — round-18 fix: the old
    * default-parameter frame broke on a non-default `idCol` exactly
    * when the store was empty, and omitted the `batch` partition
    * column the non-empty read carries). `idCol`/`idType` remain only
    * as the fallback for a store that has never committed anything.
    */
  def readFlagged(spark: SparkSession, flaggedDir: String,
                  idCol: String = "doc_id",
                  idType: org.apache.spark.sql.types.DataType =
                    org.apache.spark.sql.types.LongType): DataFrame =
    BatchStore.readAll(spark, flaggedDir).getOrElse {
      import org.apache.spark.sql.types._
      val data = BatchStore.storedSchema(spark, flaggedDir).getOrElse(
        StructType(Seq(StructField(idCol, idType),
          StructField("n_hits", LongType, nullable = false),
          StructField("batch_id", LongType, nullable = false))))
      // mirror the non-empty read exactly: partition discovery surfaces
      // `batch` as an integer-inferred, nullable trailing column
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(data.map(_.copy(nullable = true)) :+
          StructField("batch", IntegerType)))
    }
}
