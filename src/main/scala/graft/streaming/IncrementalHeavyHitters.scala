package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.util.sketch.CountMinSketch

/** Incremental heavy hitters for a continuously-ingesting key stream: the
  * classic candidates + sketch serving pattern ([[IncrementalCardinality]]'s
  * frequency counterpart). Per microbatch, via `foreachBatch`:
  *
  *  1. ONE count-min sketch over the batch's keys (map-side-mergeable
  *     fixed-memory aggregate — no key shuffle beyond the batch);
  *  2. the batch's exact top-k keys as the CANDIDATE set (a heavy hitter
  *     of the whole stream is necessarily a heavy hitter of some batch —
  *     any key with global share > 1/k exceeds 1/k in at least one batch,
  *     so the union of per-batch top-k candidate sets covers it);
  *
  * both written as idempotent `batch=<id>` subdirectories. Serving merges
  * the sketches (CMS merge is exact — counters add — given equal
  * eps/confidence/seed, which construction guarantees) and ranks the
  * candidate union by merged-sketch estimate: counts are CMS estimates
  * (never undercounts), ranking is estimate-based. Driver state is
  * bounded: one ~MB sketch per batch dir (ONE after [[compactStore]])
  * plus k candidates per batch.
  */
object IncrementalHeavyHitters {

  /** Start sketch + candidate maintenance over a streaming keyed frame. */
  def run(rows: DataFrame, keyCol: String, storeDir: String,
          checkpointDir: String, eps: Double = 1e-4, confidence: Double = 0.999,
          seed: Int = 42, k: Int = 20): StreamingQuery = {
    BatchStore.bindCheckpoint(rows.sparkSession, checkpointDir,
      s"$storeDir/sketch", s"$storeDir/cand")
    rows.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // per-batch identity re-check (see BatchStore.ensureBound)
        BatchStore.ensureBound(batch.sparkSession, checkpointDir,
          s"$storeDir/sketch", s"$storeDir/cand")
        processBatch(batch, batchId, keyCol, storeDir, eps, confidence, seed, k)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** One microbatch: sketch + exact batch top-k candidates, persisted
    * idempotently. Factored out for direct unit/replay testing.
    */
  def processBatch(batch: Dataset[Row], batchId: Long, keyCol: String,
                   storeDir: String, eps: Double, confidence: Double,
                   seed: Int, k: Int): Unit = {
    // per-substore fold guards, not one whole-batch skip: sketch and
    // cand compact independently, and a crash between the two writes
    // followed by a compaction can leave THIS batch folded in one
    // substore but absent from the other — the guard lets the replay
    // fill exactly the missing half without double-counting the
    // folded half (CMS counters add; a re-written sketch dir next to
    // the fold would count its keys twice). Checked BEFORE the
    // localCheckpoint below: a batch folded in BOTH substores writes
    // nothing, so it must not pay a full batch materialization either.
    val spark = batch.sparkSession
    val sketchFolded = BatchStore.isFolded(spark, s"$storeDir/sketch", batchId)
    val candFolded = BatchStore.isFolded(spark, s"$storeDir/cand", batchId)
    if (sketchFolded && candFolded) return
    // keys are canonicalized to STRING at insert time so the driver-side
    // estimateCount(String) at serve time hashes identically — CMS hashes
    // by runtime type, so a long-inserted key would never match a string
    // probe
    val b = batch.toDF().select(col(keyCol).cast("string").as(keyCol))
      .localCheckpoint(true) // sketch AND candidates read it
    try {
      if (!sketchFolded)
        BatchStore.writeBatch(
          b.agg(count_min_sketch(col(keyCol), lit(eps), lit(confidence), lit(seed))
            .as("sk")),
          s"$storeDir/sketch", batchId)
      if (!candFolded)
        BatchStore.writeBatch(
          b.groupBy(col(keyCol).as("key"))
            .agg(count(lit(1)).as("cnt"))
            .orderBy(desc("cnt"), asc("key"))
            .limit(k)
            .select(col("key")),
          s"$storeDir/cand", batchId)
    } finally graft.util.Pins.release(b)
  }

  /** Global heavy hitters: candidate union ranked by merged-sketch
    * estimate — (key, est_count), estimate-descending, key-ascending tie
    * break, top k. Estimates never undercount the true frequency.
    * An empty store (serving before the first batch, or an empty input
    * stream) yields the empty frame — the same graceful-degradation
    * contract as the rest of the store layout (recoverDanglingOld,
    * idempotent batch dirs), not a failure.
    */
  def readTopK(spark: SparkSession, storeDir: String, k: Int = 20): DataFrame = {
    import spark.implicits._
    mergedSketch(spark, storeDir) match {
      case None => Seq.empty[(String, Long)].toDF("key", "est_count")
      case Some(merged) =>
        val cands = BatchStore.readAll(spark, s"$storeDir/cand")
          .fold(Array.empty[String]) {
            _.select(col("key").cast("string"))
              .distinct()
              .as[String]
              .collect() // bounded: <= k per batch dir, one dir after compaction
          }
        val scored = cands
          .map(c => (c, merged.estimateCount(c)))
          .sortBy { case (key, est) => (-est, key) }
          .take(k)
        scored.toSeq.toDF("key", "est_count")
    }
  }

  /** All per-batch sketches merged driver-side (counters add exactly;
    * equal shape/seed enforced by construction). None when the store has
    * no committed sketch batches yet — the shared graceful-read contract
    * ([[BatchStore.readAll]], which also recovers a stranded compaction
    * before reading).
    */
  private def mergedSketch(spark: SparkSession, storeDir: String): Option[CountMinSketch] =
    BatchStore.readAll(spark, s"$storeDir/sketch").flatMap { df =>
      val rows = df.select(col("sk")).collect() // bounded: one ~MB row per batch dir
      if (rows.isEmpty) None
      else {
        val sketches = rows.map(r => CountMinSketch.readFrom(r.getAs[Array[Byte]](0)))
        Some(sketches.reduce { (a, b) => a.mergeInPlace(b); a })
      }
    }

  /** Fold both stores to one `batch=0` each: sketches merge exactly,
    * candidates union-distinct. Estimates and rankings are unchanged.
    */
  def compactStore(spark: SparkSession, storeDir: String): Unit = {
    BatchStore.compact(spark, s"$storeDir/sketch") { (batches, outDir) =>
      import spark.implicits._
      val merged = spark.read.parquet(batches: _*)
        .select(col("sk")).collect()
        .map(r => CountMinSketch.readFrom(r.getAs[Array[Byte]](0)))
        .reduce { (a, b) => a.mergeInPlace(b); a }
      val bos = new java.io.ByteArrayOutputStream()
      merged.writeTo(bos)
      Seq(bos.toByteArray).toDF("sk")
        .coalesce(1).write.mode("overwrite").parquet(outDir)
    }
    BatchStore.compact(spark, s"$storeDir/cand") { (batches, outDir) =>
      spark.read.parquet(batches: _*).distinct()
        .coalesce(1).write.mode("overwrite").parquet(outDir)
    }
  }
}
