package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.io.Manifest

/** Incremental dataset manifest for a continuously-ingesting table —
  * the streaming half of [[graft.io.Manifest]]: the fingerprint is a
  * modular SUM, i.e. a commutative group element, so per-microbatch
  * partial fingerprints fold to exactly the batch fingerprint of the
  * union. A pipeline that appends for a week can verify the whole
  * week's ingest against a one-shot [[Manifest.fingerprint]] of the
  * landed data — without ever rescanning history.
  *
  * Per microbatch, via `foreachBatch`: one pass computes the batch's
  * `(n_rows, partial fingerprint)` and writes it as an idempotent
  * `batch=<id>` row (overwrite semantics — a crash replay rewrites the
  * same row, never double-counts). [[read]] folds all batch rows
  * ([[Manifest.foldFingerprints]] — decimal accumulator, mod p at the
  * end); [[compact]] replaces the accumulated rows with their fold
  * under the crash-recoverable [[CompactionSwap]], LOSSLESSLY (the
  * group fold is associative).
  *
  * A modular SUM is not duplicate-tolerant, so replay idempotency must
  * survive COMPACTION too (the set-like sibling stores don't have this
  * problem): compact records every folded batch id as a `_folded/<id>`
  * marker inside the swapped-in store, and [[processBatch]] skips any
  * batch whose marker exists — a batch replayed after its fold neither
  * double-counts nor (the batch-0 case) clobbers the fold row.
  * Single-writer contract for [[compact]]: stop the stream first, like
  * every compactor in this package.
  */
object IncrementalManifest {

  def run(rows: DataFrame, storeDir: String,
          checkpointDir: String): StreamingQuery = {
    BatchStore.bindCheckpoint(rows.sparkSession, checkpointDir, storeDir)
    rows.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // per-batch identity re-check (see BatchStore.ensureBound)
        BatchStore.ensureBound(batch.sparkSession, checkpointDir, storeDir)
        processBatch(batch, batchId, storeDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** One microbatch: the batch's count + partial fingerprint, one
    * idempotent row. Factored out for direct testing.
    */
  def processBatch(batch: Dataset[Row], batchId: Long, storeDir: String): Unit = {
    // already folded into batch=0 by a compaction: a replay must not
    // re-add its contribution (and a batch-0 replay must not clobber
    // the fold row) — the shared guard every sibling store now carries
    if (BatchStore.isFolded(batch.sparkSession, storeDir, batchId))
      return
    BatchStore.writeBatch(
      batch.select(
        count(lit(1)).as("n_rows"),
        coalesce(Manifest.fingerprintCol(Manifest.reprCol(batch.toDF())), lit(0L))
          .as("partial_fp")),
      storeDir, batchId, coalesceTo = Some(1))
  }

  /** The manifest of everything ingested so far: (n_rows, fingerprint) —
    * equal to [[Manifest.fingerprint]] of the concatenated batches.
    * An empty store reads as (0, 0).
    */
  def read(spark: SparkSession, storeDir: String): (Long, Long) =
    // the shared graceful read: recovers a stranded compaction first (a
    // dangling `.old` would otherwise hide history), and a store with no
    // committed parquet footer — absent, or torn first batch — is the
    // documented (0, 0) case, not an UNABLE_TO_INFER_SCHEMA throw
    BatchStore.readAll(spark, storeDir).fold((0L, 0L)) { raw =>
      val row = raw
        .agg(coalesce(sum("n_rows"), lit(0L)).as("n"),
          coalesce(Manifest.foldFingerprints(col("partial_fp")), lit(0L)).as("fp"))
        .head
      (row.getLong(0), row.getLong(1))
    }

  /** Fold the accumulated batch rows into one — lossless (the modular
    * sum is associative), crash-recoverable via [[CompactionSwap]].
    */
  def compact(spark: SparkSession, storeDir: String): Unit =
    // fold markers (prior-carry + folded-now) are BatchStore.compact's
    // job since round 17 — this rewrite folds exactly the committed
    // batch dirs it is handed (NOT read(storeDir): an uncommitted torn
    // batch rides along verbatim and must not also enter the fold)
    BatchStore.compact(spark, storeDir) { (batches, tmpBatch0) =>
      import spark.implicits._
      val row = spark.read.parquet(batches: _*)
        .agg(coalesce(sum("n_rows"), lit(0L)).as("n"),
          coalesce(Manifest.foldFingerprints(col("partial_fp")), lit(0L)).as("fp"))
        .head
      Seq((row.getLong(0), row.getLong(1))).toDF("n_rows", "partial_fp")
        .coalesce(1).write.parquet(tmpBatch0)
    }
}
