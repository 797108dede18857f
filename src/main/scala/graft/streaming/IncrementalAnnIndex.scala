package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.similarity.Similarity

/** Streaming maintenance of a persisted IVF index — the serving-infra
  * loop that keeps ANN search warm under a continuously-ingesting
  * embedding stream, built from the batch maintenance primitives
  * ([[Similarity.appendToIvfIndex]] / [[Similarity.ivfDrift]] /
  * [[Similarity.refitIvfIndex]]) with the streaming store's
  * exactly-once discipline added on top.
  *
  * Per microbatch, via `foreachBatch`:
  *  1. the FIRST non-empty batch BOOTSTRAPS the index
  *     (`buildIvfIndex` + `writeIvfIndex` — overwrite, so a crashed
  *     bootstrap just rebuilds on replay; a `_bootstrap/<id>` marker
  *     laid down FIRST routes that replay back to the rebuild instead
  *     of the append path);
  *  2. later batches append under a crash-idempotent protocol: assigned
  *     rows are STAGED outside the live table (overwrite semantics),
  *     then renamed into the cell partitions as `b<batchId>-<n>.parquet`
  *     files, then a `_appended/<batchId>` marker commits the batch.
  *     A replay at ANY crash point converges: marker present → skip;
  *     absent → delete this batch's (possibly partial) renamed files,
  *     re-stage, re-rename — the deterministic file names are what make
  *     the cleanup exact. (Plain [[Similarity.appendToIvfIndex]] is
  *     `mode("append")` — a crash replay would double-append, which is
  *     fine for a human-driven batch job and wrong under a streaming
  *     engine's automatic retries.)
  *  3. every `driftCheckEvery` batches, [[Similarity.ivfDrift]] is
  *     consulted and a ratio above `refitAt` triggers
  *     [[Similarity.refitIvfIndex]] — the atomic marker-swap rebuild,
  *     after which partial-probe recall is restored. Open readers
  *     re-read the index per its contract.
  *
  * [[run]] calls [[Similarity.recoverIvfMaintenance]] on (re)start so a
  * crash mid-refit/compaction never leaves the index unreadable until
  * the next maintenance run happens to fire. Single-writer contract,
  * like every store in this package.
  */
object IncrementalAnnIndex {

  def run(vecs: DataFrame, idCol: String, vecCol: String, indexDir: String,
          checkpointDir: String, nlist: Int, refitAt: Double = 2.0,
          driftCheckEvery: Int = 5, seed: Long = 42L): StreamingQuery = {
    val spark = vecs.sparkSession
    Similarity.recoverIvfMaintenance(spark, indexDir)
    // re-check drift at (re)start: a crash DURING a cadence-triggered
    // refit lands after the batch's append marker committed, so the
    // replayed batch is a no-op and the in-run cadence wouldn't
    // reconsider the breach until the next divisible batchId — which an
    // AvailableNow run may never reach. The restart check closes that
    // window: a rolled-back (still-drifted) index refits here instead
    // of serving degraded recall for the rest of the run.
    val fs = CompactionSwap.fsFor(indexDir,
      spark.sparkContext.hadoopConfiguration)
    if (refitAt > 0 && fs.exists(new Path(s"$indexDir/meta")) &&
        Similarity.ivfDrift(spark, indexDir).ratio > refitAt)
      Similarity.refitIvfIndex(spark, indexDir, seed = seed)
    vecs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch, batchId, idCol, vecCol, indexDir,
          nlist, refitAt, driftCheckEvery, seed)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** One microbatch: bootstrap-or-append + drift maintenance. Factored
    * out for direct testing (crash replays are simulated by calling it
    * twice with the same batchId).
    */
  def processBatch(batch: Dataset[Row], batchId: Long, idCol: String,
                   vecCol: String, indexDir: String, nlist: Int,
                   refitAt: Double, driftCheckEvery: Int, seed: Long): Unit = {
    val spark = batch.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = CompactionSwap.fsFor(indexDir, conf)
    val appended = new Path(s"$indexDir/_appended/$batchId")
    if (fs.exists(appended)) return // full replay of a committed batch

    val bootMarker = new Path(s"$indexDir/_bootstrap/$batchId")
    val hasIndex = fs.exists(new Path(s"$indexDir/meta"))
    if (!hasIndex || fs.exists(bootMarker)) {
      // BOOTSTRAP (or its crash replay — meta may exist from a build
      // that committed before the marker-side commit below): rebuild
      // with overwrite semantics, converges from any crash point
      if (batch.isEmpty) return // nothing to build from yet
      fs.mkdirs(bootMarker.getParent)
      fs.create(bootMarker, true).close()
      Similarity.writeIvfIndex(
        Similarity.buildIvfIndex(batch.toDF(), idCol, vecCol, nlist, seed),
        indexDir)
      commitMarker(fs, appended)
    } else {
      // IDEMPOTENT APPEND: clean this batch's (possibly partial) prior
      // renames, stage fresh, rename in, then commit the marker
      val cellsDir = s"$indexDir/cells"
      fs.globStatus(new Path(s"$cellsDir/cell=*/b$batchId-*"))
        .foreach(st => fs.delete(st.getPath, false))
      val staging = s"$indexDir/.append-$batchId"
      Similarity.stageAssignedCells(spark, indexDir, batch.toDF(),
        idCol, vecCol, staging)
      val cellDirs = Option(fs.globStatus(new Path(s"$staging/cell=*")))
        .getOrElse(Array.empty)
      cellDirs.foreach { cd =>
        val dst = new Path(cellsDir, cd.getPath.getName)
        fs.mkdirs(dst)
        fs.listStatus(cd.getPath)
          .filter(_.getPath.getName.endsWith(".parquet"))
          .zipWithIndex.foreach { case (f, i) =>
            val target = new Path(dst, s"b$batchId-$i.parquet")
            if (!fs.rename(f.getPath, target))
              throw new java.io.IOException(
                s"index append failed: ${f.getPath} -> $target")
          }
      }
      fs.delete(new Path(staging), true)
      commitMarker(fs, appended)
    }

    // drift maintenance on a fixed batch cadence (not every batch — the
    // drift scan reads the full cells table)
    if (driftCheckEvery > 0 && batchId > 0 && batchId % driftCheckEvery == 0) {
      val report = Similarity.ivfDrift(spark, indexDir)
      if (report.ratio > refitAt)
        Similarity.refitIvfIndex(spark, indexDir, seed = seed)
    }
  }

  private def commitMarker(fs: org.apache.hadoop.fs.FileSystem, m: Path): Unit = {
    fs.mkdirs(m.getParent)
    fs.create(m, true).close()
  }
}
