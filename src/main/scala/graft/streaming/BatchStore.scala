package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

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
  *    [[listPriorBatches]], [[readAll]], [[compact]]);
  *  - '''id-collision refusal''' ([[ensureBound]] + the `_hwm`
  *    high-water mark, round 18): a stream whose checkpoint was
  *    deleted and recreated at the SAME path restarts batch ids at 0 —
  *    the one case a path-equality marker cannot see. The binding
  *    marker therefore also records the checkpoint's own query id
  *    (Spark stamps a fresh UUID into `<ckpt>/metadata` whenever the
  *    checkpoint is created), and every store records the highest
  *    batch id it ever committed; a below-high-water id whose dir is
  *    gone without a `_folded` record or an in-flight `_replaying`
  *    breadcrumb is never a legitimate replay and fails loudly.
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
    // High-water guard (round 18): a batch id below the highest id this
    // store ever committed, whose dir is GONE without either a _folded
    // record (compaction removed it — the store-level isFolded guard
    // normally skips these before reaching here) or an in-flight
    // _replaying breadcrumb (a prior attempt of this very overwrite
    // died after deleting the dir), is never a legitimate replay: it is
    // an id collision from a checkpoint that restarted numbering — the
    // silent-history-overwrite bindCheckpoint's doc used to disclaim.
    val hwm = readHwm(fs, storeDir)
    if (hwm.exists(batchId < _)
        && !fs.exists(new Path(s"$storeDir/batch=$batchId"))
        && !fs.exists(new Path(s"$storeDir/_folded/$batchId"))
        && !fs.exists(new Path(s"$storeDir/_replaying/$batchId")))
      throw new IllegalStateException(
        s"store $storeDir refuses batch $batchId: its high-water committed " +
          s"batch id is ${hwm.get} but batch=$batchId neither exists, nor " +
          "was folded by a compaction, nor has an in-flight replay " +
          "breadcrumb — this id belongs to a checkpoint that restarted " +
          "batch numbering (deleted/recreated checkpoint); writing it " +
          "would corrupt committed history")
    // Breadcrumb BEFORE the marker retraction: sanctions this id's
    // in-flight overwrite so a crash anywhere below (including after
    // Spark's overwrite deletes the old dir but before the new footer
    // lands) still passes the high-water guard on the healing replay.
    fs.mkdirs(new Path(s"$storeDir/_replaying"))
    fs.create(new Path(s"$storeDir/_replaying/$batchId"), true).close()
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
    // `_schema` (round 18): the write-side schema, stamped once at the
    // first committed batch, so empty/torn serving reads can build a
    // correctly-typed empty frame instead of guessing column names from
    // defaults (the StreamingDecontaminate empty-path finding).
    // UNPARTITIONED stores only: with partitionCols the read-back frame
    // reorders those columns to the end and re-infers their types, so a
    // write-side stamp would mis-describe exactly the empty frame it
    // exists to type (review finding; [[storedSchema]] documents the
    // contract).
    val schemaMarker = new Path(s"$storeDir/_schema")
    if (partitionCols.isEmpty && !fs.exists(schemaMarker))
      writeString(fs, schemaMarker, df.schema.json)
    fs.mkdirs(new Path(s"$storeDir/_committed"))
    fs.create(new Path(s"$storeDir/_committed/$batchId"), true).close()
    fs.delete(new Path(s"$storeDir/_replaying/$batchId"), false)
    if (hwm.forall(batchId > _))
      writeString(fs, new Path(s"$storeDir/_hwm"), batchId.toString)
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

  /** The write-side schema recorded at the store's first committed
    * batch (None before any batch landed, for pre-round-18 stores, or
    * for stores written with `partitionCols` — whose read-back frame
    * reorders and re-infers the partition columns, so no write-side
    * stamp can describe it). Serving paths use it to type their empty
    * frames exactly like the non-empty read — note the read-back frame
    * ALSO carries the `batch` partition column (integer-inferred),
    * which the caller appends.
    */
  def storedSchema(spark: SparkSession, storeDir: String): Option[StructType] = {
    val fs = CompactionSwap.fsFor(storeDir,
      spark.sparkContext.hadoopConfiguration)
    readString(fs, new Path(s"$storeDir/_schema")).flatMap { json =>
      scala.util.Try(org.apache.spark.sql.types.DataType.fromJson(json)
        .asInstanceOf[StructType]).toOption
    }
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
    * marker — checkpoint path, and since round 18 the checkpoint's own
    * query id from `<ckpt>/metadata`). Starting a stream with a
    * DIFFERENT checkpoint against an existing store fails loudly here —
    * a fresh checkpoint restarts batch ids at 0, so its batches would
    * silently OVERWRITE same-id history dirs, and any id already folded
    * by a compaction would be skipped outright by the replay guard (new
    * data silently dropped). The store/checkpoint pair is a unit —
    * Spark's own exactly-once contract for foreachBatch sinks. Deleting
    * and recreating the SAME checkpoint path is caught too: the
    * recreated checkpoint carries a fresh query id that no longer
    * matches the bound one ([[ensureBound]] re-verifies this inside the
    * running stream, where the id is guaranteed to exist). To
    * intentionally re-home a store, delete `<dir>/_checkpoint` (and
    * understand the id collision you are accepting).
    */
  def bindCheckpoint(spark: SparkSession, checkpointDir: String,
                     dirs: String*): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    recoverAtStart(spark, dirs: _*)
    val curId = queryIdOf(spark, checkpointDir)
    val latest = () => latestCommit(spark, checkpointDir)
    dirs.foreach { d =>
      val fs = CompactionSwap.fsFor(d, conf)
      verifyOrStamp(fs, d, checkpointDir, curId,
        createIfAbsent = false, atStart = true, latest)
      // a store dir that doesn't exist yet binds at its first batch
      // (ensureBound) — writing the marker first would CREATE the dir
      // and flip every "store exists?" empty-serving check
      gcStaleBreadcrumbs(fs, d)
    }
  }

  /** Start-time GC of `_replaying` breadcrumbs whose batch COMMITTED
    * (the crash window between the `_committed` write and the
    * breadcrumb delete leaves one behind; a committed batch never needs
    * its breadcrumb — a new overwrite re-creates it). Without the GC a
    * stale breadcrumb permanently exempts its id from the high-water
    * id-collision guard (round-18 review finding). Start-time only:
    * single-writer contract means no batch is in flight here, so
    * committed-and-breadcrumbed can only be the stale shape.
    */
  private def gcStaleBreadcrumbs(fs: FileSystem, storeDir: String): Unit = {
    val dir = new Path(s"$storeDir/_replaying")
    if (!fs.exists(dir)) return
    fs.listStatus(dir).foreach { st =>
      if (fs.exists(new Path(s"$storeDir/_committed/${st.getPath.getName}")))
        fs.delete(st.getPath, false): Unit
    }
  }

  /** The per-batch half of the identity guard, called at the top of
    * every `foreachBatch` body (round 18 — previously binding was
    * start-time only, so a store created by its first batches whose
    * process died before any restart was never bound at all). Inside a
    * running stream the checkpoint's `metadata` file is guaranteed to
    * exist, so this both stamps the binding ATOMICALLY with the first
    * batch and verifies the query id on every batch — catching a
    * deleted-and-recreated checkpoint at batch 0, before any overwrite
    * or folded-id skip can lose data.
    */
  def ensureBound(spark: SparkSession, checkpointDir: String,
                  dirs: String*): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    // one metadata read per batch, not per dir — the query id cannot
    // change while the stream runs
    val curId = queryIdOf(spark, checkpointDir)
    val latest = () => latestCommit(spark, checkpointDir)
    dirs.foreach { d =>
      verifyOrStamp(CompactionSwap.fsFor(d, conf), d, checkpointDir, curId,
        createIfAbsent = true, atStart = false, latest)
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
    *    so a re-compaction folds it instead of treating it as torn;
    *  - root marker FILES (`_checkpoint`, `_hwm`, `_schema`) and any
    *    in-flight `_replaying` breadcrumbs ride into the swapped-in
    *    store verbatim (round 18 — previously the swap dropped the
    *    `_checkpoint` binding, silently disarming the identity guard
    *    after the first compaction).
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
      // root markers ride verbatim: the checkpoint binding (dropping it
      // disarmed the identity guard after every compaction — the
      // round-17 review's medium finding), the high-water mark, the
      // schema stamp, and any in-flight replay breadcrumbs
      Seq("_checkpoint", "_hwm", "_schema").foreach { m =>
        val src = new Path(s"$storeDir/$m")
        if (fs.exists(src))
          org.apache.hadoop.fs.FileUtil.copy(fs, src, fs,
            new Path(s"$tmp/$m"), false,
            spark.sparkContext.hadoopConfiguration)
      }
      val replaying = new Path(s"$storeDir/_replaying")
      if (fs.exists(replaying))
        org.apache.hadoop.fs.FileUtil.copy(fs, replaying, fs,
          new Path(s"$tmp/_replaying"), false,
          spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(new Path(s"$tmp/_folded"))
      (priorFolded ++ committed.map(idOf)).distinct.foreach { id =>
        fs.create(new Path(s"$tmp/_folded/$id"), true).close()
      }
      fs.mkdirs(new Path(s"$tmp/_committed"))
      fs.create(new Path(s"$tmp/_committed/0"), true).close()
    }: Unit
  }

  // ---- binding / marker plumbing ----------------------------------------

  /** The streaming query id Spark stamped into `<ckpt>/metadata` when
    * the checkpoint was CREATED — stable across restarts of the same
    * checkpoint, fresh when the path is deleted and recreated, which is
    * exactly the signal the path-equality check cannot see. None before
    * the checkpoint's first start (bindCheckpoint runs then; ensureBound
    * runs inside the stream, where the file always exists).
    */
  private def queryIdOf(spark: SparkSession, checkpointDir: String): Option[String] = {
    val fs = CompactionSwap.fsFor(checkpointDir,
      spark.sparkContext.hadoopConfiguration)
    readString(fs, new Path(s"$checkpointDir/metadata")).flatMap { json =>
      """"id"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(json).map(_.group(1))
    }
  }

  /** Highest batch id in the checkpoint's own `commits/` log (None when
    * the dir is absent — a checkpoint that never completed a batch).
    * This is what a legacy marker upgrade checks the store's `_hwm`
    * against: a same-checkpoint continuation has commits covering every
    * store batch except possibly the newest.
    */
  private def latestCommit(spark: SparkSession, checkpointDir: String): Option[Long] = {
    val fs = CompactionSwap.fsFor(checkpointDir,
      spark.sparkContext.hadoopConfiguration)
    val dir = new Path(s"$checkpointDir/commits")
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).toSeq
      .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption)
      .reduceOption(_ max _)
  }

  /** Marker layout: line 1 the checkpoint path, line 2 (optional — the
    * id wasn't known at a pre-first-start bind, or the marker predates
    * round 18) the checkpoint's query id.
    */
  private def verifyOrStamp(fs: FileSystem, d: String,
                            checkpointDir: String, curId: Option[String],
                            createIfAbsent: Boolean,
                            atStart: Boolean,
                            latestCkptCommit: () => Option[Long]): Unit = {
    val marker = new Path(s"$d/_checkpoint")
    readString(fs, marker) match {
      case Some(content) =>
        val lines = content.split('\n')
        val boundPath = lines.head
        val boundId = lines.drop(1).headOption.filter(_.nonEmpty)
        if (boundPath != checkpointDir)
          throw new IllegalStateException(
            s"store $d is bound to checkpoint '$boundPath' but the stream " +
              s"was started with checkpoint '$checkpointDir' — a fresh " +
              "checkpoint restarts batch ids at 0 and would silently " +
              "overwrite (or skip, if folded) same-id history; delete " +
              s"$d/_checkpoint only for an intentional re-home")
        (boundId, curId) match {
          case (Some(b), Some(c)) if b != c =>
            throw new IllegalStateException(
              s"store $d is bound to checkpoint '$checkpointDir' under query " +
                s"id '$b', but the checkpoint at that path now carries query " +
                s"id '$c' — the checkpoint was deleted and recreated, which " +
                "restarts batch ids at 0 and would silently overwrite (or " +
                "skip, if folded) same-id history; delete " +
                s"$d/_checkpoint only for an intentional re-home")
          case (Some(b), None) if atStart =>
            // history is owned by a checkpoint run that no longer exists
            // on disk — starting now would mint a fresh id and collide
            throw new IllegalStateException(
              s"store $d is bound to checkpoint '$checkpointDir' under query " +
                s"id '$b', but no metadata exists at that checkpoint path — " +
                "the checkpoint was deleted; starting a fresh one would " +
                "restart batch ids at 0 and silently overwrite (or skip, if " +
                s"folded) same-id history; delete $d/_checkpoint only for " +
                "an intentional re-home")
          case (None, Some(c)) =>
            // Legacy / pre-first-start marker (path only): upgrade in
            // place with the id — UNLESS the store already carries
            // committed history the checkpoint's own commit log does not
            // cover (round-19 advisor fix). A path-only marker cannot
            // say which query id owns the history; stamping the CURRENT
            // id would bless a checkpoint that was deleted and recreated
            // at the same path before the first post-upgrade run, whose
            // restarted batch ids then overwrite same-id history (the
            // dirs still exist, so the _hwm guard passes). A legitimate
            // same-checkpoint continuation has commit files for every
            // store batch except possibly the newest (the store write
            // lands before the checkpoint commit), so `hwm - 1` is the
            // coverage bar. Residual window, documented: a store whose
            // ONLY committed batch is 0 upgrades either way — at hwm 0 a
            // recreated checkpoint replaying batch 0 is indistinguishable
            // from the same checkpoint's crash-before-commit-0 replay.
            val hwm = readHwm(fs, d)
            val covered = latestCkptCommit()
            if (hwm.exists(h => covered.getOrElse(-1L) < h - 1))
              throw new IllegalStateException(
                s"store $d carries a legacy path-only binding to checkpoint " +
                  s"'$checkpointDir' and committed history up to batch " +
                  s"${hwm.get}, but that checkpoint's commit log only covers " +
                  s"batch ${covered.getOrElse(-1L)} — the checkpoint was " +
                  "deleted and recreated (fresh query id, batch ids restart " +
                  "at 0), so an in-place marker upgrade would bless silent " +
                  s"same-id history overwrites; delete $d/_checkpoint only " +
                  "for an intentional re-home")
            writeString(fs, marker, s"$checkpointDir\n$c")
          case _ => ()
        }
      case None =>
        if (createIfAbsent || fs.exists(new Path(d)))
          writeString(fs, marker,
            curId.fold(checkpointDir)(id => s"$checkpointDir\n$id"))
    }
  }

  private def readHwm(fs: FileSystem, storeDir: String): Option[Long] =
    readString(fs, new Path(s"$storeDir/_hwm"))
      .flatMap(s => scala.util.Try(s.trim.toLong).toOption)

  /** An empty marker reads as ABSENT: the only way one arises is a
    * crash inside a marker write, and treating it as content would
    * permanently brick the store ("bound to checkpoint ''"). A file
    * that VANISHES between the exists check and the open is absent too —
    * that is [[writeString]]'s delete-then-rename window. Any other read
    * failure PROPAGATES (round-19 advisor fix: the old blanket
    * `Try(...).toOption` turned a transient IOException on `_checkpoint`
    * into "not bound", so verifyOrStamp would silently re-stamp the
    * marker to whatever checkpoint was currently running — a flaky
    * filesystem could launder a wrong-checkpoint binding through the
    * identity guard; "could not verify" must fail loudly, never read as
    * "not bound").
    */
  private def readString(fs: FileSystem, p: Path): Option[String] =
    try {
      if (!fs.exists(p)) None
      else {
        val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        val in = fs.open(p)
        try in.readFully(buf) finally in.close()
        Some(new String(buf, java.nio.charset.StandardCharsets.UTF_8))
          .filter(_.nonEmpty)
      }
    } catch {
      case _: java.io.FileNotFoundException => None // the rename window
    }

  /** Marker writes are TMP-THEN-RENAME (round-18 review finding): a
    * bare create+write can die mid-way and leave a truncated marker —
    * for `_checkpoint` that reads as a binding to the wrong value and
    * refuses every subsequent start. With the rename, a crash leaves
    * either the old content or no marker at all (the delete window),
    * and an absent marker just re-stamps on the next start/batch.
    */
  private def writeString(fs: FileSystem, p: Path, s: String): Unit = {
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"marker write failed: $tmp -> $p")
  }
}
