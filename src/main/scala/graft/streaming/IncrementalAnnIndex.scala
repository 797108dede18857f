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
  *     re-read the index per its contract. With `skewRefitAt > 0`
  *     (round 16) the SAME report's cell-population skew
  *     (`cellSkew` = max/median member count — the hot-cell signal
  *     scatter drift cannot see, e.g. in-distribution appends piling
  *     into one cell) also triggers the refit, and a skew-triggered
  *     refit GROWS nlist to hold the build-time average cell
  *     population (`ceil(nlist · liveRows / builtRows)`) — a refit at
  *     the old nlist re-clusters but cannot rebalance genuinely
  *     concentrated mass (SimilaritySpec "cell-skew telemetry" pins
  *     both halves). This is the streaming form of the
  *     nlist-grows-with-the-corpus posture the scale soaks run.
  *
  * With an `encoder` supplied, the maintainer also keeps a QUANTIZED
  * sidecar (`<indexDir>/encoded` — the `encoded` table
  * [[graft.similarity.Sq.ivfSq8TopK]] / [[graft.similarity.Pq.ivfPqTopK]]
  * serve from) warm, closing the lifecycle hole where appended vectors
  * reach quantized search only through the exact-rerank anti-join
  * branch (correct, but its cost grows with the append delta until
  * someone re-encodes):
  *
  *  - each streamed batch is encoded INLINE under the same batch
  *    marker + deterministic-name protocol (`e<batchId>-<n>.parquet`),
  *    so the sidecar never lags the stream — post-batch queries take
  *    the pure int8/ADC path, not the fallback;
  *  - the `driftCheckEvery` cadence (and stream (re)start) additionally
  *    measures the OUT-OF-BAND delta — rows someone appended via plain
  *    [[Similarity.appendToIvfIndex]] outside this stream — and when
  *    `unencoded / total > reencodeAt` re-encodes the whole cells table
  *    under a crash-recoverable [[CompactionSwap.swap]], the same
  *    heal-on-threshold posture the drift→refit loop has.
  *
  * The encoder receives a `(vec_id, vec)` frame (zero-norm rows already
  * dropped, mirroring the cells table's guard, so sidecar and cells
  * row counts stay comparable) and must return rows keyed `vec_id` —
  * e.g. `df => Sq.encode(df, "vec_id", "vec")`, or a PQ/OPQ closure
  * over a loaded codebook. An IVF refit never invalidates the sidecar:
  * codes depend only on the vectors, not on cell assignment.
  *
  * Trained-encoder caveat: SQ8 is stateless (per-vector scale), so its
  * codes never stale — the recommended streaming sidecar. A PQ/OPQ
  * closure freezes its codebook/rotation; distribution drift erodes
  * ADC quality the same way it erodes the coarse quantizer, and this
  * maintainer deliberately does NOT retrain through the closure (the
  * codebook is the caller's artifact, persisted via
  * [[graft.similarity.Pq.saveCodebook]]/[[graft.similarity.Opq.save]]).
  * The operational recipe: when [[Similarity.ivfDrift]] breaches —
  * the same signal that triggers the refit here — retrain the
  * codebook offline, persist it, restart the stream with the new
  * closure, and run one [[reencode]] pass (the forced form — after a
  * codebook swap the row-count delta is 0, so the threshold path
  * correctly sees nothing stale) to rewrite the sidecar under the
  * swap.
  *
  * [[run]] calls [[Similarity.recoverIvfMaintenance]] on (re)start so a
  * crash mid-refit/compaction never leaves the index unreadable until
  * the next maintenance run happens to fire. Single-writer contract,
  * like every store in this package.
  */
object IncrementalAnnIndex {

  def run(vecs: DataFrame, idCol: String, vecCol: String, indexDir: String,
          checkpointDir: String, nlist: Int, refitAt: Double = 2.0,
          driftCheckEvery: Int = 5, seed: Long = 42L,
          encoder: Option[DataFrame => DataFrame] = None,
          reencodeAt: Double = 0.1,
          skewRefitAt: Double = 0.0): StreamingQuery = {
    val spark = vecs.sparkSession
    Similarity.recoverIvfMaintenance(spark, indexDir)
    // checkpoint-identity guard (shared with the batch=<id> stores): a
    // fresh checkpoint restarts batch ids at 0, and the `_appended/<id>`
    // replay markers of the OLD stream would silently skip the new
    // stream's first batches — their vectors never reach the index
    BatchStore.bindCheckpoint(spark, checkpointDir, indexDir)
    encoder.foreach { enc =>
      val fs0 = CompactionSwap.fsFor(indexDir,
        spark.sparkContext.hadoopConfiguration)
      // a crashed re-encode swap strands the sidecar under `.old`;
      // recover before the startup delta check reads its footer counts
      CompactionSwap.recoverDanglingOld(fs0, encodedDir(indexDir))
      // startup delta check, for the same reason as the startup drift
      // check below: out-of-band appends between runs shouldn't wait
      // for the next divisible batchId (which AvailableNow may never
      // reach) to get their codes
      if (fs0.exists(new Path(s"$indexDir/meta")))
        reencodeIfStale(spark, indexDir, enc, reencodeAt)
    }
    // re-check drift at (re)start: a crash DURING a cadence-triggered
    // refit lands after the batch's append marker committed, so the
    // replayed batch is a no-op and the in-run cadence wouldn't
    // reconsider the breach until the next divisible batchId — which an
    // AvailableNow run may never reach. The restart check closes that
    // window: a rolled-back (still-drifted) index refits here instead
    // of serving degraded recall for the rest of the run.
    val fs = CompactionSwap.fsFor(indexDir,
      spark.sparkContext.hadoopConfiguration)
    if ((refitAt > 0 || skewRefitAt > 0) &&
        fs.exists(new Path(s"$indexDir/meta")))
      maintainFit(spark, indexDir, refitAt, skewRefitAt, seed)
    vecs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // per-batch identity re-check (see BatchStore.ensureBound)
        BatchStore.ensureBound(batch.sparkSession, checkpointDir, indexDir)
        processBatch(batch, batchId, idCol, vecCol, indexDir,
          nlist, refitAt, driftCheckEvery, seed, encoder, reencodeAt,
          skewRefitAt)
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
                   refitAt: Double, driftCheckEvery: Int, seed: Long,
                   encoder: Option[DataFrame => DataFrame] = None,
                   reencodeAt: Double = 0.1,
                   skewRefitAt: Double = 0.0): Unit = {
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
      // initial sidecar from the WRITTEN cells (already zero-norm
      // filtered); overwrite semantics — a crash replay re-runs the
      // whole bootstrap branch, so a half-written sidecar self-heals
      encoder.foreach { enc =>
        enc(cellsAsVecInput(spark.read.parquet(s"$indexDir/cells")))
          .write.mode("overwrite").parquet(encodedDir(indexDir))
      }
      commitMarker(fs, appended)
    } else {
      // IDEMPOTENT APPEND: clean this batch's (possibly partial) prior
      // renames, stage fresh, rename in, then commit the marker
      val cellsDir = s"$indexDir/cells"
      Option(fs.globStatus(new Path(s"$cellsDir/cell=*/b$batchId-*")))
        .getOrElse(Array.empty)
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
      // INLINE encode of the batch under the same uncommitted window:
      // clean this batch's prior encoded files, stage, rename in with
      // deterministic names — the sidecar commits atomically WITH the
      // cells append at the marker below, so quantized queries never
      // see this batch in cells but not in codes (or vice versa after
      // a replay)
      encoder.foreach { enc =>
        val eDir = encodedDir(indexDir)
        Option(fs.globStatus(new Path(s"$eDir/e$batchId-*")))
          .getOrElse(Array.empty)
          .foreach(st => fs.delete(st.getPath, false))
        val eStaging = s"$indexDir/.encode-$batchId"
        enc(batchAsVecInput(batch.toDF(), idCol, vecCol))
          .write.mode("overwrite").parquet(eStaging)
        fs.mkdirs(new Path(eDir))
        Option(fs.globStatus(new Path(s"$eStaging/part-*.parquet")))
          .getOrElse(Array.empty)
          .zipWithIndex.foreach { case (f, i) =>
            val target = new Path(eDir, s"e$batchId-$i.parquet")
            if (!fs.rename(f.getPath, target))
              throw new java.io.IOException(
                s"sidecar encode failed: ${f.getPath} -> $target")
          }
        fs.delete(new Path(eStaging), true)
      }
      commitMarker(fs, appended)
    }

    // drift + out-of-band-delta maintenance on a fixed batch cadence
    // (not every batch — both scans read the full cells table / its
    // footer counts)
    if (driftCheckEvery > 0 && batchId > 0 && batchId % driftCheckEvery == 0) {
      maintainFit(spark, indexDir, refitAt, skewRefitAt, seed)
      encoder.foreach(enc => reencodeIfStale(spark, indexDir, enc, reencodeAt))
    }
  }

  /** The shared refit decision (cadence + restart): one drift report,
    * refit on a scatter-drift breach (frozen-quantizer OOD erosion) OR
    * a cell-skew breach (hot-cell concentration). A skew-triggered
    * refit grows nlist to hold the build-time AVERAGE cell population —
    * re-clustering at the old nlist cannot rebalance genuinely
    * concentrated mass, more cells can (see the object doc). Growth is
    * capped at the live row count (a quantizer cannot have more useful
    * cells than vectors).
    */
  private[graft] def maintainFit(spark: org.apache.spark.sql.SparkSession,
                          indexDir: String, refitAt: Double,
                          skewRefitAt: Double, seed: Long): Unit = {
    // REFUSE while an UNCOMMITTED append batch is pending (the restart
    // path can see one): a refit would rebuild the batch's half-renamed
    // cells rows into anonymous part files that the replay's
    // deterministic `b<batchId>-*` cleanup glob cannot find, so the
    // replayed batch would append its vectors a SECOND time — the exact
    // hazard [[reencodeIfStale]] already vetoes for the sidecar. The
    // skipped check is not lost: the replay converges the batch first,
    // and drift/skew re-measure at the next cadence or clean restart.
    val fs = CompactionSwap.fsFor(indexDir,
      spark.sparkContext.hadoopConfiguration)
    if (uncommittedAppendIds(fs, indexDir).nonEmpty) return
    val report = Similarity.ivfDrift(spark, indexDir)
    val driftBreach = refitAt > 0 && report.ratio > refitAt
    val skewBreach = skewRefitAt > 0 && report.cellSkew > skewRefitAt
    if (driftBreach || skewBreach) {
      val grown = if (!skewBreach) None else {
        val meta = spark.read.parquet(s"$indexDir/meta").collect().head
        val n = meta.getAs[Int]("nlist")
        val built = math.max(1L, meta.getAs[Long]("built_rows"))
        val live = spark.read.parquet(s"$indexDir/cells").count()
        // clamp BEFORE .toInt: live is a row count bounded only by the
        // index size, and past 2^31 vectors the unclamped narrowing
        // wraps negative and crashes the refit it was sizing
        Some(math.min(math.min(live, Int.MaxValue.toLong),
          math.max(n + 1L, math.ceil(n.toDouble * live / built).toLong)).toInt)
      }
      Similarity.refitIvfIndex(spark, indexDir, nlist = grown, seed = seed)
    }
  }

  /** Path of the quantized sidecar the maintainer keeps warm. */
  def encodedDir(indexDir: String): String = s"$indexDir/encoded"

  /** The live sidecar as a DataFrame — the `encoded` argument of
    * [[graft.similarity.Sq.ivfSq8TopK]] / [[graft.similarity.Pq.ivfPqTopK]].
    */
  def readEncoded(spark: org.apache.spark.sql.SparkSession,
                  indexDir: String): DataFrame =
    spark.read.parquet(encodedDir(indexDir))

  /** (cells rows, sidecar rows) — two parquet footer counts, no data
    * scan. Shared by [[unencodedCount]] and [[reencodeIfStale]] so the
    * cells table is never footer-counted twice per maintenance check.
    */
  private def storeCounts(spark: org.apache.spark.sql.SparkSession,
                          indexDir: String): (Long, Long) = {
    val fs = CompactionSwap.fsFor(indexDir,
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(s"$indexDir/cells"))) return (0L, 0L)
    val cells = spark.read.parquet(s"$indexDir/cells").count()
    val enc =
      if (fs.exists(new Path(encodedDir(indexDir))))
        spark.read.parquet(encodedDir(indexDir)).count()
      else 0L
    (cells, enc)
  }

  /** Rows in the cells table the sidecar has no code for — exactly the
    * rows quantized search routes through its exact-rerank anti-join
    * fallback (encoded rows are only ever produced FROM cells rows, so
    * the count difference IS the delta).
    */
  def unencodedCount(spark: org.apache.spark.sql.SparkSession,
                     indexDir: String): Long = {
    val (cells, enc) = storeCounts(spark, indexDir)
    math.max(0L, cells - enc)
  }

  /** Cells-table batch ids whose `_appended` marker is missing — the
    * signature of an append that crashed between its renames and its
    * commit. The streaming engine will replay exactly these batches.
    */
  private def uncommittedAppendIds(fs: org.apache.hadoop.fs.FileSystem,
                                   indexDir: String): Set[Long] =
    Option(fs.globStatus(new Path(s"$indexDir/cells/cell=*/b*-*")))
      .getOrElse(Array.empty)
      .flatMap(st => scala.util.Try(
        st.getPath.getName.stripPrefix("b").takeWhile(_ != '-').toLong).toOption)
      .toSet
      .filterNot(id => fs.exists(new Path(s"$indexDir/_appended/$id")))

  /** Full re-encode of the cells table into the sidecar when the
    * out-of-band delta fraction exceeds `reencodeAt`, under a
    * crash-recoverable swap. Returns true when a re-encode ran.
    * Callable directly for one-shot maintenance of a batch-appended
    * index (the non-streaming twin of [[Similarity.refitIvfIndex]]).
    *
    * REFUSES (returns false) while an UNCOMMITTED append batch is
    * pending: its cells rows are already on disk but its replay is
    * still coming, and that replay cleans up only its own
    * `e<batchId>-*` sidecar files — a re-encode here would fold the
    * batch's rows into anonymous part files the replay cannot see,
    * and the replayed inline encode would then land the same vectors
    * a SECOND time (duplicate code rows → duplicate shortlist
    * candidates → wrong top-k, and a sidecar forever over-counted so
    * the staleness check never fires again). The skipped check is not
    * lost: the replay's inline encode covers the batch, and any
    * out-of-band delta is re-measured at the next cadence or clean
    * (re)start.
    */
  def reencodeIfStale(spark: org.apache.spark.sql.SparkSession,
                      indexDir: String, encoder: DataFrame => DataFrame,
                      reencodeAt: Double): Boolean = {
    val fs = CompactionSwap.fsFor(indexDir,
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(s"$indexDir/cells"))) return false
    if (uncommittedAppendIds(fs, indexDir).nonEmpty) return false
    val (total, enc) = storeCounts(spark, indexDir)
    if (total == 0) return false
    val delta = math.max(0L, total - enc)
    if (delta.toDouble / total <= reencodeAt) return false
    doReencode(spark, fs, indexDir, encoder)
    true
  }

  /** UNCONDITIONAL full re-encode of the cells table into the sidecar
    * (same swap and same uncommitted-batch veto as [[reencodeIfStale]],
    * without the staleness gate — the row-count delta cannot see a
    * CODEBOOK change, where every count matches but every code is
    * wrong under the new encoder). Run this once after swapping a
    * retrained PQ/OPQ artifact. Returns true when the re-encode ran.
    */
  def reencode(spark: org.apache.spark.sql.SparkSession,
               indexDir: String, encoder: DataFrame => DataFrame): Boolean = {
    val fs = CompactionSwap.fsFor(indexDir,
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(s"$indexDir/cells"))) return false
    if (uncommittedAppendIds(fs, indexDir).nonEmpty) return false
    doReencode(spark, fs, indexDir, encoder)
    true
  }

  /** The swap itself, after the caller has cleared the cells-exist and
    * uncommitted-batch gates — factored out so [[reencodeIfStale]]
    * doesn't repeat the full-tree `b*-*` glob and exists checks it
    * just ran (on an object store those are LIST round-trips, the same
    * economy argument as storeCounts' single footer pass).
    */
  private def doReencode(spark: org.apache.spark.sql.SparkSession,
                         fs: org.apache.hadoop.fs.FileSystem,
                         indexDir: String,
                         encoder: DataFrame => DataFrame): Unit = {
    val eDir = encodedDir(indexDir)
    val write = (tmp: String) =>
      encoder(cellsAsVecInput(spark.read.parquet(s"$indexDir/cells")))
        .write.mode("overwrite").parquet(tmp)
    if (fs.exists(new Path(eDir))) CompactionSwap.swap(fs, eDir)(write): Unit
    else write(eDir) // first encode of a batch-built index: nothing live to swap
  }

  /** Normalize the cells projection to the encoder's `(vec_id, vec)`
    * input contract.
    */
  private def cellsAsVecInput(cells: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    cells.select(col("neighbor_id").as("vec_id"), col("cvec").as("vec"))
  }

  /** Normalize a raw streamed batch to `(vec_id, vec)`, dropping
    * zero-norm rows exactly like the cells writers do — the sidecar
    * must never hold a code for a row the cells table rejected, or the
    * footer-count delta would go negative and mask real staleness.
    */
  private def batchAsVecInput(batch: DataFrame, idCol: String,
                              vecCol: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    batch.select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
      .filter(Similarity.norm(col("vec")) > 0)
  }

  private def commitMarker(fs: org.apache.hadoop.fs.FileSystem, m: Path): Unit = {
    fs.mkdirs(m.getParent)
    fs.create(m, true).close()
  }
}
