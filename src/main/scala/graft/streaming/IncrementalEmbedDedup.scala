package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.similarity.Similarity

/** Incremental EMBEDDING near-duplicate detection for a continuously-
  * ingesting vector corpus — the semantic-dedup counterpart of
  * [[IncrementalDedup]] (which catches textual near-dups): each
  * microbatch of embeddings is checked for cosine near-duplicates
  * within itself AND against a persistent SRP-bucketed store of every
  * previously ingested vector.
  *
  * Per batch, via `foreachBatch`:
  *  1. seeded signed-random-projection bucket + norm per new vector
  *     (pure map — positive scaling never changes a bucket, so a
  *     rescaled copy of an old vector always lands on its bucket);
  *  2. within-batch candidates: bucket equi-self-join + exact cosine
  *     verify at `threshold`;
  *  3. new-vs-store candidates: the store is written
  *     `partitionBy(bucket)`, and the batch side of the join is
  *     BROADCAST — the scan is eligible for dynamic partition pruning
  *     down to the store buckets the batch actually touches (an index
  *     probe, not a history scan: the same pruning shape as the
  *     persisted IVF index);
  *  4. duplicates appended to `dupDir`, vectors to `storeDir` — both
  *     one idempotent `batch=<id>` subdir per microbatch (a crash
  *     replay overwrites its own output; the store lookup reads only
  *     batches strictly earlier than the current one).
  *
  * Store growth is bounded by [[compactStore]] (same crash-recoverable
  * [[CompactionSwap]] dance as the text store). At 100 TB the bucket
  * count is the scale knob exactly as in
  * [[Similarity.srpNearDupPairs]]: numPlanes ≈ log2(corpus /
  * targetBucketSize) keeps each partition — and so each probe — small.
  */
object IncrementalEmbedDedup {

  /** Start the incremental embedding dedup over a streaming
    * (idCol, vecCol: array<float|double>) frame.
    */
  def run(vecs: DataFrame, idCol: String, vecCol: String,
          storeDir: String, dupDir: String, checkpointDir: String,
          threshold: Double = 0.9, numPlanes: Int = 8, dim: Int = 64,
          seed: Long = 42L, keptDir: Option[String] = None): StreamingQuery = {
    BatchStore.bindCheckpoint(vecs.sparkSession, checkpointDir,
      Seq(storeDir, dupDir) ++ keptDir: _*)
    vecs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // per-batch identity re-check (see BatchStore.ensureBound)
        BatchStore.ensureBound(batch.sparkSession, checkpointDir,
          Seq(storeDir, dupDir) ++ keptDir: _*)
        processBatch(batch, batchId, idCol, vecCol, storeDir, dupDir,
          threshold, numPlanes, dim, seed, keptDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** One microbatch: detect + persist. Factored out for direct testing. */
  def processBatch(batch: Dataset[Row], batchId: Long, idCol: String,
                   vecCol: String, storeDir: String, dupDir: String,
                   threshold: Double, numPlanes: Int, dim: Int, seed: Long,
                   keptDir: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    // folded-batch replay guard ([[IncrementalDedup.processBatch]]'s
    // rationale): the store write below is last, so a folded batch's
    // dup/kept output is already on disk and the skip is lossless
    if (BatchStore.isFolded(spark, storeDir, batchId)) return
    val planes = Similarity.randomPlanes(numPlanes, dim, seed)
    // "b"-prefixed bucket: partition values must stay strings ("0101"
    // would type-infer as the integer 101 and collide with "101")
    val bucketed = batch.toDF()
      .select(col(idCol).as("vec_id"), col(vecCol).as("vec"),
        concat(lit("b"), Similarity.srpBucket(col(vecCol), planes)).as("bucket"),
        Similarity.norm(col(vecCol)).as("nrm"))
      .localCheckpoint(true) // feeds both joins AND the store append

    def cosine(a: String, b: String, na: String, nb: String) =
      Similarity.dot(col(a), col(b)) / (col(na) * col(nb))

    // a zero-norm vector has no direction: its cosine is 0/0 = NaN, and
    // Spark's NaN-largest ordering makes `NaN >= threshold` TRUE — one
    // zero vector would flag as a near-dup of every bucket-mate. Exclude
    // zero norms from BOTH sides of both pair joins (mirroring
    // Pq.slices' guard); they still persist to the store as corpus rows.
    val comparable = bucketed.filter(col("nrm") > 0)

    val withinPairs = {
      val a = comparable.select(col("bucket"), col("vec_id").as("new_id"),
        col("vec").as("vec_a"), col("nrm").as("nrm_a"))
      val b = comparable.select(col("bucket"), col("vec_id").as("dup_of"),
        col("vec").as("vec_b"), col("nrm").as("nrm_b"))
      a.join(b, "bucket")
        .filter(col("dup_of") < col("new_id")) // the earlier id is the keeper
        .withColumn("cosine_sim", cosine("vec_a", "vec_b", "nrm_a", "nrm_b"))
        .filter(col("cosine_sim") >= threshold)
        .select(col("new_id"), col("dup_of"), col("cosine_sim"),
          lit("batch").as("src"))
    }

    // store lookup strictly below the current batch id: idempotent on replay
    val priorBatches = BatchStore.listPriorBatches(spark, storeDir, batchId)
    val storePairs =
      if (priorBatches.isEmpty) withinPairs.limit(0)
      else {
        // batch side broadcast => dynamic partition pruning of the
        // bucket-partitioned store scan (only touched buckets are read).
        // basePath: each batch dir holds bucket=* subdirs — without it,
        // multi-root partition discovery sees conflicting structures
        val store = spark.read.option("basePath", storeDir)
          .parquet(priorBatches: _*)
          .filter(col("nrm") > 0) // stored zero-norm rows can't be dups either
          .select(col("bucket"), col("vec_id").as("dup_of"),
            col("vec").as("vec_b"), col("nrm").as("nrm_b"))
        store.join(
            broadcast(comparable.select(col("bucket"), col("vec_id").as("new_id"),
              col("vec").as("vec_a"), col("nrm").as("nrm_a"))),
            "bucket")
          .filter(col("new_id") =!= col("dup_of"))
          .withColumn("cosine_sim", cosine("vec_a", "vec_b", "nrm_a", "nrm_b"))
          .filter(col("cosine_sim") >= threshold)
          .select(col("new_id"), col("dup_of"), col("cosine_sim"),
            lit("store").as("src"))
      }

    val dups = withinPairs
      .select(col("new_id").as("new_id"), col("dup_of").as("dup_of"),
        col("cosine_sim").as("cosine_sim"), col("src").as("src"))
      .union(storePairs
        .select(col("new_id").as("new_id"), col("dup_of").as("dup_of"),
          col("cosine_sim").as("cosine_sim"), col("src").as("src")))
      .distinct()

    val dupsOut = dups.localCheckpoint(true)
    BatchStore.writeBatch(dupsOut, dupDir, batchId)
    keptDir.foreach { kd =>
      val b = batch.toDF()
      val dupIds = dupsOut.select(col("new_id"))
      BatchStore.writeBatch(
        b.join(dupIds, b(idCol) === dupIds("new_id"), "left_anti"),
        kd, batchId)
    }
    // compacted store last — its commit marker licenses the fold, and
    // the folded-replay skip is lossless only after every sink landed
    BatchStore.writeBatch(bucketed, storeDir, batchId,
      partitionCols = Seq("bucket"))

    // checkpointed microbatch state is consumed by now — without the
    // unpersist a long-running stream accumulates one pinned RDD pair
    // per microbatch in executor storage
    graft.util.Pins.release(bucketed)
    graft.util.Pins.release(dupsOut)
  }

  /** All near-duplicate records detected so far (any batch). */
  def readDuplicates(spark: SparkSession, dupDir: String): DataFrame =
    spark.read.parquet(dupDir).select("new_id", "dup_of", "cosine_sim", "src")

  /** Compact the vector store into a single `batch=0` (which sorts below
    * every live microbatch id), preserving the bucket partitioning the
    * probe's pruning relies on. Single-writer contract: stop the stream
    * first. Crash-recoverable via the shared [[CompactionSwap]].
    */
  def compactStore(spark: SparkSession, storeDir: String): Unit =
    BatchStore.compact(spark, storeDir) { (batches, batch0) =>
      spark.read.option("basePath", storeDir).parquet(batches: _*)
        .select("bucket", "vec_id", "vec", "nrm")
        .write.mode("overwrite").partitionBy("bucket").parquet(batch0)
    }
}
