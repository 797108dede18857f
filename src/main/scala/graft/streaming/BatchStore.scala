package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The shared `batch=<id>`-per-microbatch store protocol — ONE
  * implementation of the contract every incremental store in this
  * package hand-rolled before round 17 ([[IncrementalDedup]],
  * [[IncrementalCdcDedup]], [[IncrementalEmbedDedup]],
  * [[IncrementalManifest]], [[IncrementalCardinality]],
  * [[IncrementalHeavyHitters]], [[IncrementalTokenizerDrift]],
  * [[StreamingDecontaminate]]):
  *
  *  - '''idempotent batch subdirs''' ([[writeBatch]]): one
  *    `batch=<id>` subdirectory per microbatch, written with
  *    `overwrite` mode, so a batch replayed after a crash overwrites
  *    its own previous (possibly partial) output instead of
  *    duplicating it;
  *  - '''strictly-earlier lookups''' ([[listPriorBatches]]): a store
  *    read during batch N sees only batches < N — a replay can never
  *    join against its own half-written output;
  *  - '''graceful torn/empty reads''' ([[readAll]]): a store that
  *    doesn't exist yet, or whose first batch crashed before any
  *    parquet footer committed, serves `None` (callers substitute
  *    their empty frame) instead of throwing schema-inference errors
  *    mid-incident;
  *  - '''crash-recoverable compaction''' ([[compact]]): fold every
  *    batch dir into `batch=0` (sorts below every live microbatch id,
  *    so the strictly-earlier rule keeps holding) under
  *    [[CompactionSwap.swap]]'s marked three-step dance, with dangling
  *    `.old` recovery at every entry point ([[recoverAtStart]],
  *    [[listPriorBatches]], [[readAll]], [[compact]]).
  *
  * The recovery ordering and batch-dir filter live here once — they
  * cannot drift between stores. The contract itself is pinned by the
  * parameterized `BatchStoreContractSpec` (one spec, run against every
  * store) and exhaustively crash-fuzzed by `CrashFuzzSpec`.
  */
private[graft] object BatchStore {

  /** Write one idempotent batch subdir: `storeDir/batch=<id>`,
    * overwrite mode (the crash-replay contract), then commit it with a
    * `_committed/<id>` marker. The marker is what makes COMPACTION
    * crash-safe: [[compact]] folds only committed batch dirs into
    * `batch=0` — a dir whose write crashed mid-flight (no marker) is
    * carried verbatim so its replay can still overwrite it, never
    * frozen half-written into the fold. `partitionCols` layers hive
    * partitioning INSIDE the batch dir (the embed store's bucket
    * pruning); `coalesceTo` bounds file count for stores whose batch
    * output is a handful of rows (manifest, cardinality).
    */
  def writeBatch(df: DataFrame, storeDir: String, batchId: Long,
                 partitionCols: Seq[String] = Nil,
                 coalesceTo: Option[Int] = None): Unit = {
    val fs = CompactionSwap.fsFor(storeDir,
      df.sparkSession.sparkContext.hadoopConfiguration)
    // RETRACT the marker before the overwrite, not just write it after:
    // a batch being REPLAYED already carries its marker from the first
    // run, and a crash in the middle of the overwrite below would
    // otherwise leave a torn dir that still reads as committed — a
    // subsequent compaction would fold the partial data and the fold
    // guard would skip the healing replay forever (round-17 review
    // finding; the unmarked-dirs-ride-verbatim rule only protects dirs
    // that never had a marker).
    fs.delete(new Path(s"$storeDir/_committed/$batchId"), false)
    val out = coalesceTo.fold(df)(df.coalesce)
    val w = out.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(s"$storeDir/batch=$batchId")
    fs.mkdirs(new Path(s"$storeDir/_committed"))
    fs.create(new Path(s"$storeDir/_committed/$batchId"), true).close()
  }

  /** Whether `batchId` was already folded into `batch=0` by a
    * compaction. A store's `processBatch` must consult this (and skip,
    * or skip the affected write) before re-writing a batch dir: after
    * the fold, `batch=<id>` no longer exists, so a crash-replayed write
    * would ADD the batch's contribution a second time — exactly
    * doubling sum-semantics state (manifest fingerprints, CMS
    * counters) and corrupting recompute-against-history stores (the
    * replayed dedup batch would find its own folded signatures in the
    * store). Underscore-prefixed, so parquet readers never see it.
    */
  def isFolded(spark: SparkSession, storeDir: String, batchId: Long): Boolean = {
    val fs = CompactionSwap.fsFor(storeDir,
      spark.sparkContext.hadoopConfiguration)
    fs.exists(new Path(s"$storeDir/_folded/$batchId"))
  }

  /** Recover any compaction stranded between its renames for each dir —
    * called where a writer (re)starts, BEFORE the stream recreates the
    * store dir (or every pre-crash row would be invisible to the
    * restarted stream until the next read-side recovery).
    */
  def recoverAtStart(spark: SparkSession, dirs: String*): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    dirs.foreach { d =>
      CompactionSwap.recoverDanglingOld(CompactionSwap.fsFor(d, conf), d)
    }
  }

  /** [[recoverAtStart]] plus the checkpoint-identity guard: every store
    * dir records which streaming checkpoint owns it (`_checkpoint`
    * marker, written on first bind). Starting a stream with a DIFFERENT
    * checkpoint against an existing store fails loudly here — a fresh
    * checkpoint restarts batch ids at 0, so its batches would silently
    * OVERWRITE same-id history dirs, and any id already folded by a
    * compaction would be skipped outright by the replay guard (new data
    * silently dropped). The store/checkpoint pair is a unit — Spark's
    * own exactly-once contract for foreachBatch sinks. To intentionally
    * re-home a store, delete `<dir>/_checkpoint` (and understand the id
    * collision you are accepting); deleting and recreating the SAME
    * checkpoint path evades this guard — don't.
    */
  def bindCheckpoint(spark: SparkSession, checkpointDir: String,
                     dirs: String*): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    recoverAtStart(spark, dirs: _*)
    dirs.foreach { d =>
      val fs = CompactionSwap.fsFor(d, conf)
      val marker = new Path(s"$d/_checkpoint")
      if (fs.exists(marker)) {
        val buf = new Array[Byte](fs.getFileStatus(marker).getLen.toInt)
        val in = fs.open(marker)
        try in.readFully(buf) finally in.close()
        val bound = new String(buf, java.nio.charset.StandardCharsets.UTF_8)
        if (bound != checkpointDir)
          throw new IllegalStateException(
            s"store $d is bound to checkpoint '$bound' but the stream " +
              s"was started with checkpoint '$checkpointDir' — a fresh " +
              "checkpoint restarts batch ids at 0 and would silently " +
              "overwrite (or skip, if folded) same-id history; delete " +
              s"$d/_checkpoint only for an intentional re-home")
      } else if (fs.exists(new Path(d))) {
        val out = fs.create(marker, true)
        try out.write(checkpointDir.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      }
      // a store dir that doesn't exist yet binds on the next start —
      // writing the marker first would CREATE the dir and flip every
      // "store exists?" empty-serving check
    }
  }

  /** The whole store as one frame (every batch subdir; `batch` surfaces
    * as a partition column), or `None` when the store doesn't exist or
    * holds no committed parquet footer yet — the graceful torn/empty
    * read every serving path owes its callers (serving must not throw
    * exactly during the incident it exists to observe). Recovers a
    * dangling `.old` first: a stranded compaction would otherwise hide
    * the entire history from this read.
    */
  def readAll(spark: SparkSession, storeDir: String): Option[DataFrame] = {
    val fs = CompactionSwap.fsFor(storeDir,
      spark.sparkContext.hadoopConfiguration)
    CompactionSwap.recoverDanglingOld(fs, storeDir)
    if (!fs.exists(new Path(storeDir))) None
    else
      try Some(spark.read.parquet(storeDir))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
  }

  /** `batch=<id>` subdirs of `storeDir` with id strictly below `batchId`
    * (replay safety: a replayed batch never joins against its own
    * half-written output). Recovers any dangling `.old` first — a
    * stranded compaction would otherwise hide the entire history.
    */
  def listPriorBatches(spark: SparkSession, storeDir: String,
                       batchId: Long): Seq[String] = {
    val fs = CompactionSwap.fsFor(storeDir,
      spark.sparkContext.hadoopConfiguration)
    CompactionSwap.recoverDanglingOld(fs, storeDir)
    val root = new Path(storeDir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        p.getName.startsWith("batch=") &&
          scala.util.Try(p.getName.stripPrefix("batch=").toLong)
            .toOption.exists(_ < batchId)
      }
      .map(_.toString)
  }

  /** Compact every COMMITTED batch dir into `batch=0` under a
    * crash-recoverable swap; `rewrite(batches, tmpBatch0Dir)` does the
    * store-specific merge write over exactly the batch dirs it is
    * handed. Single-writer contract: stop the stream first.
    *
    * Fold bookkeeping (generalized from IncrementalManifest's ad-hoc
    * markers in round 17):
    *  - only batch dirs carrying a `_committed/<id>` marker are folded —
    *    a dir whose write crashed mid-flight is copied VERBATIM into the
    *    rewrite so its eventual replay still overwrites it (folding a
    *    half-written batch would freeze the partial data and the
    *    `_folded` skip would make it permanent);
    *  - every folded id is recorded under `_folded/` in the swapped-in
    *    store (prior markers carried forward), which [[isFolded]] serves;
    *  - `batch=0` itself is marked committed (it is, by construction),
    *    so a re-compaction folds it instead of treating it as torn.
    *
    * An UNMARKED batch dir is always carried verbatim, even when no
    * `_committed` dir exists at all: a brand-new store whose very first
    * write crashed mid-parquet has exactly that shape, and a
    * treat-as-committed compatibility rule would fold the torn dir and
    * then skip its replay — permanent data loss. An unmarked-but-
    * actually-complete dir costs only deferred compaction: its next
    * replay re-writes it through [[writeBatch]], which marks it, and
    * the following compaction folds it.
    */
  def compact(spark: SparkSession, storeDir: String)
             (rewrite: (Seq[String], String) => Unit): Unit = {
    val fs = CompactionSwap.fsFor(storeDir,
      spark.sparkContext.hadoopConfiguration)
    CompactionSwap.recoverDanglingOld(fs, storeDir)
    val batches = listPriorBatches(spark, storeDir, Long.MaxValue)
    if (batches.isEmpty) return
    def idOf(b: String): String = {
      val name = new Path(b).getName
      name.stripPrefix("batch=")
    }
    val (committed, torn) = batches.partition(b =>
      fs.exists(new Path(s"$storeDir/_committed/${idOf(b)}")))
    if (committed.isEmpty) return // nothing safely foldable
    // A torn batch=0 collides with the fold target by NAME: carrying it
    // verbatim would merge its partial files into the rewrite's
    // tmp/batch=0, and worse, its eventual replay would OVERWRITE
    // batch=0 — destroying the fold of every other batch. Reachable via
    // a crash mid-way through batch 0's replay overwrite (the marker
    // retraction above classifies that dir as torn). Defer the whole
    // compaction until the replay heals it; the next compact folds
    // everything.
    if (torn.exists(b => idOf(b) == "0")) return
    val priorFolded = {
      val dir = new Path(s"$storeDir/_folded")
      if (fs.exists(dir)) fs.listStatus(dir).map(_.getPath.getName).toSeq
      else Seq.empty
    }
    CompactionSwap.swap(fs, storeDir) { tmp =>
      rewrite(committed, s"$tmp/batch=0")
      // torn batch dirs ride along unchanged — COPY, not rename: the
      // live store must stay intact until the swap's renames (a crash
      // mid-rewrite must lose only the tmp dir)
      torn.foreach { b =>
        org.apache.hadoop.fs.FileUtil.copy(fs, new Path(b), fs,
          new Path(tmp, new Path(b).getName), false,
          spark.sparkContext.hadoopConfiguration)
      }
      fs.mkdirs(new Path(s"$tmp/_folded"))
      (priorFolded ++ committed.map(idOf)).distinct.foreach { id =>
        fs.create(new Path(s"$tmp/_folded/$id"), true).close()
      }
      fs.mkdirs(new Path(s"$tmp/_committed"))
      fs.create(new Path(s"$tmp/_committed/0"), true).close()
    }: Unit
  }
}
