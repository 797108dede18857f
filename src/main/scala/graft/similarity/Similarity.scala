package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import scala.util.Random

/** Similarity search over embedding columns (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a signed-random-
  * projection (SRP) LSH-bucketed variant as the approximate scale path.
  *
  * All vector math is pure Catalyst higher-order functions (`zip_with` /
  * `aggregate` / `transform`) in double precision — no UDFs, codegen
  * throughout.
  *
  * Scale notes: the query side is always the broadcast side (queries ≪
  * corpus); the corpus is scanned once. The SRP variant equi-joins on
  * bucket keys so candidate generation is a hash join, not a cross join.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision — native codegen expression (no
    * intermediate array per pair, unlike the `aggregate(zip_with(...))`
    * formulation; see [[graft.functions.DotProduct]]).
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExprs.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** True cosine similarity dot/(‖a‖·‖b‖). (The reference's pseudo-cosine
    * `dot/(‖a‖+‖b‖)` — `sources/2.2/source/KMeansMapper.java:29-56` — is a
    * bug we deliberately do not reproduce; see SURVEY §7.2.)
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** The reference's pseudo-cosine `dot/(‖a‖+‖b‖)` (sum, not product, of
    * norms — `sources/2.2/source/KMeansMapper.java:29-56`), kept only as a
    * clearly-named compatibility shim for replaying the reference's
    * clustering trajectories. Not used by any engine operator.
    */
  def referenceSimilarity(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) + norm(b))

  /** Exact brute-force top-k cosine neighbors for each query vector.
    * `queries` is broadcast; ranking tie-breaks on candidate id so results
    * are deterministic. Self-matches are excluded.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    // norms hoisted out of the pair loop: computed once per row, not per pair
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      norm(col(vecCol)).as("qnorm"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
      norm(col(vecCol)).as("cnorm"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine_sim",
        dot(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine_sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine_sim", "rank")
  }

  /** All embedding pairs with cosine >= threshold (embedding-space near-dup
    * detection). Brute force — the SRP variant below is the scale path.
    */
  def cosineNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                         threshold: Double): DataFrame = {
    // norms hoisted out of the pair loop: computed once per row, not per pair
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"),
      norm(col(vecCol)).as("norm_a"))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"),
      norm(col(vecCol)).as("norm_b"))
    a.crossJoin(broadcast(b))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine_sim",
        dot(col("vec_a"), col("vec_b")) / (col("norm_a") * col("norm_b")))
      .filter(col("cosine_sim") >= threshold)
      .select("id_a", "id_b", "cosine_sim")
  }

  /** A built IVF index: the corpus bucketed by nearest coarse centroid
    * (`cells`: cell, neighbor_id, cvec RAW, cnorm) plus the centroid table
    * itself (centroids live in the L2-normalized space the quantizer was
    * fit in). Cells keep the RAW vectors + hoisted norms so the in-cell
    * score `dot/(qnorm·cnorm)` is bit-identical to [[bruteForceTopK]] —
    * at `nprobe == nlist` the index path IS the exact query. Build once,
    * serve many query batches — at 100 TB the cells table is written
    * `partitionBy("cell")` so a probe touching `nprobe` of `nlist` cells
    * scans only those partitions.
    */
  final case class IvfIndex(cells: DataFrame, centroids: Array[(Int, Array[Double])],
                            seed: Long = 42L)

  /** Build the IVF coarse quantizer: seeded K-Means over the L2-normalized
    * corpus, one fit + one transform (cell assignment). Euclidean cells on
    * unit vectors order like cosine. The normalization exists only for the
    * fit; the cells table keeps the raw vectors.
    *
    * The raw columns ride along through `model.transform` (a narrow map)
    * instead of being joined back on `neighbor_id` — so each input row
    * maps to exactly ONE cells row even if ids repeat, and
    * [[refitIvfIndex]]'s row-count invariant holds for any corpus an
    * append may have produced.
    */
  def buildIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
                    nlist: Int, seed: Long = 42L): IvfIndex = {
    import org.apache.spark.ml.functions.array_to_vector
    val raw = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
      norm(col(vecCol)).as("cnorm"))
      // a zero-norm vector has no direction: scale() would emit NaN
      // features into the k-means fit, and at query time its cosine is
      // NaN — which ranks FIRST under descending order, making the zero
      // vector the top-1 neighbor of every query probing its cell. Drop
      // here, the same guard appendToIvfIndex and Pq.slices apply.
      .filter(col("cnorm") > 0)
    val withFeats = raw.withColumn("features",
      // codegen vec_scale, not transform(_ / norm) (interpreted)
      array_to_vector(graft.functions.VectorExprs.scale(col("cvec"), col("cnorm"))))
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(nlist).setMaxIter(10).setSeed(seed)
      // train on the lean projection; the wide raw columns stay out of
      // the fit's cached training set
      .fit(withFeats.select("neighbor_id", "features"))
    val cells = model.transform(withFeats)
      .select(col("prediction").as("cell"), col("neighbor_id"), col("cvec"),
        col("cnorm"))
    IvfIndex(cells,
      model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) },
      seed)
  }

  /** Persist an index: cells as parquet partitioned by cell id (the probe
    * join's pruning column), centroids as a tiny sidecar parquet, plus a
    * metadata sidecar (nlist, dim, train seed, row count at build, and
    * the BUILD-QUALITY field `built_mean_dist` — the mean assignment
    * distance of the written members to their centroids) that
    * [[readIvfIndex]] asserts against — a probe over a stale, truncated,
    * or mismatched index fails loudly instead of returning quiet
    * garbage — and that [[ivfDrift]] compares against to decide when an
    * append-grown index needs [[refitIvfIndex]].
    */
  def writeIvfIndex(index: IvfIndex, path: String): Unit = {
    index.cells.write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
    val spark = index.cells.sparkSession
    import spark.implicits._
    index.centroids.toSeq.toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    val nlist = index.centroids.length
    val dim = index.centroids.headOption.map(_._2.length).getOrElse(0)
    // measure the WRITTEN files (count = parquet footer counts, no data
    // scan; mean dist = one scan), so the sidecar records exactly what
    // landed on disk
    val written = spark.read.parquet(s"$path/cells")
    val builtRows = written.count()
    val builtMeanDist = meanAssignedDist(written, index.centroids)
    Seq((nlist, dim, index.seed, builtRows, builtMeanDist))
      .toDF("nlist", "dim", "seed", "built_rows", "built_mean_dist")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Mean SQUARED Euclidean distance of each cell member (as a unit
    * vector — the space the quantizer was fit in) to its own centroid:
    * the k-means within-cluster scatter per row. Equivalent ordering to
    * the assignment metric `‖c‖²/2 − û·c` (same per-row argmin) but
    * non-negative, so the [[ivfDrift]] RATIO is well-behaved — the raw
    * assignment metric goes negative on tight clusters and a ratio over
    * it would invert. Direct codegen `vec_sqdist` kernel (no
    * cancellation-prone expansion); one broadcast join on `cell` + one
    * scan.
    */
  private def meanAssignedDist(cells: DataFrame,
                               centroids: Array[(Int, Array[Double])]): Double = {
    val spark = cells.sparkSession
    import spark.implicits._
    val cents = centroids.toSeq.toDF("cell", "__centroid")
    cells.join(broadcast(cents), "cell")
      .select(graft.functions.VectorExprs.sqdist(
        graft.functions.VectorExprs.scale(col("cvec"), col("cnorm")),
        col("__centroid")).as("__d"))
      .agg(avg("__d"))
      .head match {
        // an empty cells table averages to null — report 0 scatter
        // rather than NPE, so an empty index still writes its sidecar
        case r if r.isNullAt(0) => 0.0
        case r => r.getDouble(0)
      }
  }

  /** Drift report for a persisted index: the build-time mean assignment
    * distance (from the metadata sidecar) vs the CURRENT one over the
    * live cells table with the frozen centroids. [[appendToIvfIndex]]
    * never refits, so as appended data drifts from the build
    * distribution the ratio climbs above 1 — the signal that recall is
    * silently eroding and a [[refitIvfIndex]] is due. A freshly built or
    * freshly refit index reports ratio ≈ 1 (same data, same metric).
    *
    * CELL-POPULATION SKEW telemetry (round 16): `maxCell` /
    * `medianCell` / `cellSkew` = max over median member count across
    * ALL nlist cells (centroids with no members count 0 — an emptying
    * cell is skew, not absence). Scatter drift can stay low while
    * appends pile into a few cells — in-distribution growth that is
    * nonetheless operationally rotten: the hot cell's probe cost grows
    * toward a scan (every query probing it pays its population) and
    * its shuffle partition becomes the straggler. `cellSkew` is the
    * straggler early-warning scatter can't see; the same
    * max-over-typical shape as the skew-join salting decision.
    * Conventions mirror `ratio`: median 0 with members anywhere is
    * +Infinity (totally ordered, loud under arithmetic), a fully empty
    * index is 1.0 (no members, no skew). Cost: one nlist-bounded
    * count aggregate — footer-cheap next to the scatter scan.
    */
  final case class IvfDriftReport(builtMeanDist: Double, currentMeanDist: Double,
                                  ratio: Double, maxCell: Long,
                                  medianCell: Double, cellSkew: Double)

  def ivfDrift(spark: org.apache.spark.sql.SparkSession, path: String): IvfDriftReport = {
    val idx = readIvfIndex(spark, path)
    val meta = spark.read.parquet(s"$path/meta").collect().head
    require(meta.schema.fieldNames.contains("built_mean_dist"),
      s"IVF index at $path predates the build-quality sidecar — refit or " +
        "rebuild it before measuring drift")
    val built = meta.getAs[Double]("built_mean_dist")
    val current = meanAssignedDist(idx.cells, idx.centroids)
    // cell populations over ALL nlist cells (missing => 0), nlist-bounded
    val popByCell = idx.cells
      .groupBy(col("cell").cast("int").as("cell"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pops = idx.centroids.map { case (c, _) => popByCell.getOrElse(c, 0L) }
      .sorted
    val maxCell = if (pops.isEmpty) 0L else pops.last
    val medianCell =
      if (pops.isEmpty) 0.0
      else if (pops.length % 2 == 1) pops(pops.length / 2).toDouble
      else (pops(pops.length / 2 - 1) + pops(pops.length / 2)) / 2.0
    val cellSkew =
      if (medianCell > 0) maxCell / medianCell
      else if (maxCell == 0L) 1.0
      else Double.PositiveInfinity
    // a degenerate build (empty index, or every member exactly at its
    // centroid — e.g. nlist >= distinct vectors) has built==0: a plain
    // ratio would be NaN. No scatter then vs no scatter now is "no
    // drift" (1.0); any current scatter over a zero baseline is maximal
    // drift, reported as +Infinity — still totally ordered for
    // threshold comparisons, and unlike a MaxValue sentinel it cannot
    // be mistaken for a genuine (huge) ratio or silently wrap under
    // downstream arithmetic (sums/averages propagate Infinity loudly).
    val ratio =
      if (built > 0) current / built
      else if (current == 0) 1.0
      else Double.PositiveInfinity
    IvfDriftReport(built, current, ratio, maxCell, medianCell, cellSkew)
  }

  /** Re-train the coarse quantizer over the CURRENT cells table (the
    * build corpus plus everything appended since) and atomically replace
    * the whole index — the maintenance step [[ivfDrift]] calls for.
    * `nlist` defaults to the existing quantizer's size; the row count is
    * asserted unchanged (a refit must never lose or duplicate a vector).
    * Crash-safe under the same write-new → marker → rename protocol as
    * [[compactIvfCells]], at the INDEX directory level (`.refitting` /
    * `.swapping` / `.old` siblings of `path`): a crash at any point
    * either rolls forward to the validated new index on the next refit,
    * rolls back, or fails loudly. Same single-writer contract, recovery
    * included; open readers must re-read the index after a refit.
    */
  def refitIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                    nlist: Option[Int] = None, seed: Long = 42L): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    recoverMarkedSwap(fs, path, ".refitting")
    val live = new org.apache.hadoop.fs.Path(path)
    require(fs.exists(live), s"no IVF index at $path to refit")
    val meta = spark.read.parquet(s"$path/meta").collect().head
    val k = nlist.getOrElse(meta.getAs[Int]("nlist"))
    val before = spark.read.parquet(s"$path/cells").count()
    val tmp = new org.apache.hadoop.fs.Path(path + ".refitting")
    fs.delete(tmp, true)
    writeIvfIndex(
      buildIvfIndex(spark.read.parquet(s"$path/cells")
        .select("neighbor_id", "cvec"), "neighbor_id", "cvec", k, seed),
      tmp.toString)
    val after = spark.read.parquet(s"$tmp/cells").count()
    require(after == before,
      s"IVF refit would change the row count ($before -> $after); aborting")
    // The swap replaces the WHOLE index dir, but the rebuild wrote only
    // meta/centroids/cells — everything else the live dir accumulated
    // must ride into the replacement or the swap DELETES it with `.old`
    // (round 18, found by AnnCrashFuzzSpec; the same bug class as the
    // BatchStore compaction dropping `_checkpoint`): the `encoded`
    // sidecar (codes depend only on vectors — a refit never invalidates
    // them), and above all the `_appended`/`_bootstrap` replay markers —
    // losing those turns the next crash-replay of an already-committed
    // batch into a silent DOUBLE-APPEND (its deterministic-name cleanup
    // glob can't see the rows the refit rewrote into anonymous files).
    // COPY, not rename: the live dir must stay intact until the renames.
    fs.listStatus(live).foreach { st =>
      val name = st.getPath.getName
      if (name != "meta" && name != "centroids" && name != "cells")
        org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs,
          new org.apache.hadoop.fs.Path(tmp, name), false, conf)
    }
    markedSwap(fs, path, tmp)
  }

  /** Load a persisted index, asserting its metadata sidecar: centroid
    * count and dimension must match the build, and the cells table must
    * hold at least the rows present at build time (appends only grow it;
    * fewer rows means a truncated or partially-overwritten index). The
    * cells scan is partition-pruned when the probe filters on `cell`
    * (statically or via dynamic partition pruning through the broadcast
    * probe join).
    */
  def readIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex = {
    val meta = spark.read.parquet(s"$path/meta").collect().head
    val (nlist, dim) = (meta.getAs[Int]("nlist"), meta.getAs[Int]("dim"))
    val (seed, builtRows) = (meta.getAs[Long]("seed"), meta.getAs[Long]("built_rows"))
    val cents = spark.read.parquet(s"$path/centroids")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(cents.length == nlist,
      s"IVF index at $path: ${cents.length} centroids but meta says nlist=$nlist")
    require(cents.forall(_._2.length == dim),
      s"IVF index at $path: centroid dimension != meta dim=$dim")
    val cells = spark.read.parquet(s"$path/cells")
    val nRows = cells.count() // footer counts, no data scan
    require(nRows >= builtRows,
      s"IVF index at $path: cells has $nRows rows, fewer than the $builtRows " +
        "present at build — stale or partially overwritten index")
    IvfIndex(cells, cents, seed)
  }

  /** Append new vectors to a PERSISTED index without refitting the
    * quantizer: each new vector is assigned to its nearest EXISTING
    * coarse centroid — the same Euclidean-in-normalized-space rule the
    * builder's `model.transform` applies (`||c||²/2 − ŝ·c` with ŝ the
    * unit vector; centroids are not unit norm, so plain max-dot would
    * disagree with the builder) — and appended into that cell's
    * partition. This is the serve-many maintenance path: corpus growth
    * is absorbed by cell appends, and recall erodes only as the data
    * distribution drifts from the frozen centroids, at which point a
    * rebuild re-clusters. `queryIvf` at `nprobe == nlist` stays EXACT
    * over the grown corpus (`SimilaritySpec`).
    *
    * The argmin runs on a SKINNY explode (id × nlist, min(struct)
    * partial-aggregated map-side) joined back to the raw vectors — the
    * wide vector column never multiplies through the shuffle.
    */
  def appendToIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                       newVecs: DataFrame, idCol: String, vecCol: String): Unit =
    writeAssignedCells(spark, path, newVecs, idCol, vecCol,
      s"$path/cells", "append")

  /** Stage a batch of assigned rows OUTSIDE the live cells table
    * (overwrite semantics — safe to re-run): the first half of a
    * crash-idempotent append, used by the streaming index maintainer
    * ([[graft.streaming.IncrementalAnnIndex]]), which then renames the
    * staged files into the cell partitions under a batch marker.
    */
  def stageAssignedCells(spark: org.apache.spark.sql.SparkSession, path: String,
                         newVecs: DataFrame, idCol: String, vecCol: String,
                         stagingPath: String): Unit =
    writeAssignedCells(spark, path, newVecs, idCol, vecCol,
      stagingPath, "overwrite")

  /** Recover any crashed maintenance swap on a persisted index — a
    * refit at the index level, a compaction at the cells level. Both
    * maintenance entry points self-recover when next invoked; call this
    * at process (re)start so a crash mid-swap doesn't leave the index
    * unreadable until the NEXT maintenance run happens to fire. No-op
    * on a clean index.
    */
  def recoverIvfMaintenance(spark: org.apache.spark.sql.SparkSession,
                            path: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    recoverMarkedSwap(fs, path, ".refitting")
    recoverMarkedSwap(fs, s"$path/cells", ".compacting")
  }

  private def writeAssignedCells(spark: org.apache.spark.sql.SparkSession,
                                 path: String, newVecs: DataFrame,
                                 idCol: String, vecCol: String,
                                 outPath: String, mode: String): Unit = {
    val idx = readIvfIndex(spark, path)
    val raw = newVecs.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
      norm(col(vecCol)).as("cnorm"))
      // a zero-norm vector has no direction: at query time its cosine is
      // NaN, which ranks FIRST under descending order — one appended zero
      // vector would become the top-1 neighbor of every query probing its
      // cell. Drop them here, consistent with Pq.slices' guard.
      .filter(col("cnorm") > 0)
      // per-ROW identity: ids may legitimately repeat (the cells table
      // supports that — buildIvfIndex's scaladoc), so the argmin below
      // must group on a row key, NOT on neighbor_id — grouping by id
      // would collapse two different vectors sharing an id into one
      // cell, silently mis-assigning one of them. The id is generated
      // BEFORE the eager checkpoint, which freezes its values: the
      // assign and the join-back read the same materialized rows.
      .withColumn("__rid", monotonically_increasing_id())
      .localCheckpoint(true)
    try {
      val centroidLits = idx.centroids.map { case (i, c) =>
        struct(lit(i).as("cell"), array(c.map(lit).toSeq: _*).as("centroid"),
          lit(c.map(x => x * x).sum / 2).as("halfnormsq"))
      }
      val assigned = raw
        .select(col("__rid"),
          graft.functions.VectorExprs.scale(col("cvec"), col("cnorm")).as("__unit"),
          explode(array(centroidLits.toSeq: _*)).as("cc"))
        .withColumn("__cdist",
          col("cc.halfnormsq") - dot(col("__unit"), col("cc.centroid")))
        .groupBy("__rid")
        // min(struct) ties break on cell id (zero norms filtered above)
        .agg(min(struct(col("__cdist"), col("cc.cell").as("cell"))).as("__best"))
        .select(col("__rid"), col("__best.cell").as("cell"))
      assigned.join(raw, "__rid")
        .select("cell", "neighbor_id", "cvec", "cnorm")
        .write.mode(mode).partitionBy("cell").parquet(outPath)
    } finally
      // the write consumed the checkpointed batch: release the pin even
      // on a failed write, or a long-lived (retrying) index service
      // leaks one pinned RDD per attempt
      graft.util.Pins.release(raw)
  }

  /** Compact a persisted index's cells table: [[appendToIvfIndex]] adds
    * one file per append per cell, and probe cost eventually tracks file
    * count (open/footer overhead) as much as row count. Rewrites each
    * cell partition as ~one file, preserving the partitioned layout; the
    * row count is asserted unchanged against the live table before the
    * swap (compaction must never lose or duplicate a vector — the
    * metadata sidecar keeps protecting reads afterwards).
    *
    * Crash-safe via write-new → marker → rename-away → rename-in: the
    * `.swapping` marker is created only AFTER the new copy is written
    * and count-validated, so its presence certifies the `.compacting`
    * dir as a complete, equivalent replacement — which lets
    * [[recoverCellsSwap]] roll the swap FORWARD from any crash point
    * (including the once-ambiguous "live and `.old` both present"
    * window, where the new data had fully landed and `.old` was merely
    * stale). Without the marker, live + `.old` still fails loudly: that
    * combination then means a non-marker writer ran before recovery,
    * and cell partitions are not idempotent replay units to guess over.
    * Single-writer contract: do not append concurrently — and the
    * contract covers RECOVERY invocations too: a second
    * [[compactIvfCells]] (whose recovery pass deletes any un-markered
    * `.compacting` dir) must not race an in-flight compaction that is
    * between marker creation and its first rename. One maintenance
    * writer per index path, including crash recovery, full stop.
    */
  def compactIvfCells(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val cellsDir = s"$path/cells"
    val fs = new org.apache.hadoop.fs.Path(cellsDir).getFileSystem(conf)
    recoverMarkedSwap(fs, cellsDir, ".compacting")
    val live = new org.apache.hadoop.fs.Path(cellsDir)
    if (!fs.exists(live)) return
    val tmp = new org.apache.hadoop.fs.Path(cellsDir + ".compacting")
    fs.delete(tmp, true)
    val before = spark.read.parquet(cellsDir).count()
    // repartition on the partition column: each task holds whole cells,
    // so every cell partition lands as a single file per writing task
    spark.read.parquet(cellsDir)
      .repartition(col("cell"))
      .write.partitionBy("cell").parquet(tmp.toString)
    val after = spark.read.parquet(tmp.toString).count()
    require(after == before,
      s"IVF compaction would change the row count ($before -> $after); aborting")
    markedSwap(fs, cellsDir, tmp)
  }

  /** The marker-certified directory swap [[compactIvfCells]] and
    * [[refitIvfIndex]] share: caller has already written AND validated
    * the complete replacement at `tmp`. Creates `<live>.swapping`, then
    * live → `.old` → tmp → live → delete `.old` → delete marker; the
    * marker is created only after validation, so its presence certifies
    * `tmp` as a complete equivalent and every crash window is
    * recoverable by [[recoverMarkedSwap]].
    */
  private def markedSwap(fs: org.apache.hadoop.fs.FileSystem,
                         liveDir: String,
                         tmp: org.apache.hadoop.fs.Path): Unit = {
    val live = new org.apache.hadoop.fs.Path(liveDir)
    val old = new org.apache.hadoop.fs.Path(liveDir + ".old")
    val marker = new org.apache.hadoop.fs.Path(liveDir + ".swapping")
    fs.create(marker, true).close()
    if (!fs.rename(live, old)) {
      fs.delete(marker, false)
      throw new java.io.IOException(s"IVF swap failed: $live -> $old")
    }
    if (!fs.rename(tmp, live)) {
      fs.rename(old, live) // roll back to the pre-swap dir
      fs.delete(marker, false)
      throw new java.io.IOException(s"IVF swap failed: $tmp -> $live")
    }
    fs.delete(old, true)
    fs.delete(marker, false): Unit
  }

  /** Crash recovery for a [[markedSwap]] at `liveDir` whose replacement
    * was staged at `liveDir + tmpExt`. With the `.swapping` marker
    * present the stranded staged copy is known complete and validated,
    * so every crash window rolls FORWARD (or harmlessly aborts a swap
    * that never started); without it, a stranded `.old` rolls back, and
    * live + `.old` together means an unmarked writer ran before
    * recovery — refuse to guess.
    */
  private def recoverMarkedSwap(fs: org.apache.hadoop.fs.FileSystem,
                                liveDir: String, tmpExt: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(liveDir)
    val old = new org.apache.hadoop.fs.Path(liveDir + ".old")
    val tmp = new org.apache.hadoop.fs.Path(liveDir + tmpExt)
    val marker = new org.apache.hadoop.fs.Path(liveDir + ".swapping")
    def renameOrThrow(src: org.apache.hadoop.fs.Path,
                      dst: org.apache.hadoop.fs.Path): Unit =
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"IVF swap recovery failed: $src -> $dst")
    if (fs.exists(marker)) {
      (fs.exists(live), fs.exists(old), fs.exists(tmp)) match {
        case (true, false, true) => // crash before live was renamed away:
          fs.delete(tmp, true) // swap never started; abort, rerun redoes it
          fs.delete(marker, false)
        case (false, true, true) => // crash between the two renames:
          renameOrThrow(tmp, live) // tmp is validated-complete; roll forward
          fs.delete(old, true)
          fs.delete(marker, false)
        case (true, true, false) => // crash after swap, before delete(.old):
          fs.delete(old, true) // new data fully landed; .old is stale
          fs.delete(marker, false)
        case (true, false, false) => // crash after delete(.old):
          fs.delete(marker, false)
        case state =>
          throw new IllegalStateException(
            s"IVF swap marker $marker with unexpected dir state " +
              s"(live, old, tmp)=$state — reconcile manually")
      }
      return
    }
    if (!fs.exists(old)) return
    if (fs.exists(live))
      throw new IllegalStateException(
        s"both $liveDir and $old exist with no swap marker — an unmarked " +
          "writer ran before recovery; reconcile manually (dir swaps are " +
          "not idempotent)")
    renameOrThrow(old, live)
  }

  /** The `nprobe` nearest cells of each query, ranked by the SAME
    * Euclidean-in-normalized-space metric the quantizer assigns members
    * by — `‖c‖²/2 − û·c` with û the unit query vector, here multiplied
    * through by the positive per-query constant `qnorm` so no division
    * appears: `qnorm·‖c‖²/2 − q·c`. K-means centroids of unit vectors
    * are NOT unit norm themselves, so ranking by `−q·c` alone (dropping
    * the `‖c‖²/2` term) probes cells in a different order than members
    * were assigned in, silently lowering recall whenever
    * `nprobe < nlist`. A zero-norm query scores every cell 0 and falls
    * back to the cell-id tie-break, as before.
    * Output: (query_id, qvec, qnorm, cell) — one row per probed cell.
    *
    * TWO forms, selected by the CALLER's probe cardinality (round 16):
    *
    *  - [[probeCells]] — the single-stage `row_number` window over the
    *    exploded |Q| × nlist candidates. For the BROADCAST-probe
    *    callers ([[queryIvf]], [[queryIvfRadius]], the SQ8/PQ/OPQ
    *    probes), whose query sets are small by contract, this is the
    *    cheapest plan: one codegen stage + one tiny window, no extra
    *    exchange.
    *  - [[probeCellsSkinny]] — for CORPUS-SIZED probe sides
    *    ([[shuffleProbeScored]]: the KNN graph build and the
    *    cross-corpus ANN join). The window form carries qvec through
    *    the |Q| × nlist rank exchange at full vector width (~50× the
    *    bytes at dim 64), and the codegen explode's unmanaged
    *    per-input-row burst (nlist WIDE rows buffered at the stage
    *    boundary) OOMed the 100× soak outright under a starved memory
    *    fraction — spilling cannot relieve memory that codegen row
    *    buffers hold. The skinny form projects the candidate stream
    *    down to (query_id, cell, cdist) — ~24 bytes — inside the
    *    explode stage, cuts to nprobe with the bounded-heap
    *    [[graft.functions.TopKBy]] aggregate (map-side partials keep
    *    ≤ nprobe rows per query per partition, no rank exchange at
    *    all), and joins (qvec, qnorm) back on `query_id` once per
    *    probed cell. Costs ~2 extra small stages — noise at corpus
    *    probe sizes, measured 4× less spill and OOM→complete at the
    *    100× starved soak.
    *
    * Selection semantics are bit-identical between the forms: TopKBy's
    * (ord DESC, tie ASC) on −cdist replays (cdist ASC, cell ASC)
    * exactly, and the negation is IEEE-exact.
    */
  private[similarity] def probeCells(index: IvfIndex, qRaw: DataFrame,
                                     nprobe: Int): DataFrame = {
    val centroidLits = centroidStructs(index)
    qRaw
      .select(col("query_id"), col("qvec"), col("qnorm"),
        explode(array(centroidLits.toSeq: _*)).as("cc"))
      .withColumn("cdist",
        col("qnorm") * col("cc.halfnormsq") - dot(col("qvec"), col("cc.centroid")))
      .withColumn("crank", row_number().over(
        Window.partitionBy("query_id").orderBy(asc("cdist"), asc("cc.cell"))))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("qvec"), col("qnorm"), col("cc.cell").as("cell"))
  }

  /** The corpus-sized-probe twin of [[probeCells]] — same output
    * contract, same selection, bounded-heap plan shape (see the
    * two-forms note there). Selection parity is exact for FINITE
    * centroid distances; NaN distances are mapped to +Inf below so
    * neither form can select a non-finite cell over a finite one (the
    * only residual divergence is the NaN-vs-+Inf mutual tie-break,
    * unreachable with finite inputs).
    *
    * `qRaw` is referenced TWICE (the skinny explode side and the
    * join-back of the wide columns), so a non-deterministic query plan
    * (sample/limit/rand-derived) could evaluate differently between
    * the two and silently drop or mis-score queries. Guarded the same
    * way [[graft.dedup.Dedup]]'s adaptive joins guard their
    * re-referenced side: fail loudly at plan time and tell the caller
    * to localCheckpoint first. The single-reference window form
    * ([[probeCells]]) has no such constraint.
    */
  private[similarity] def probeCellsSkinny(index: IvfIndex, qRaw: DataFrame,
                                           nprobe: Int): DataFrame = {
    assertDeterministic(qRaw, "probeCellsSkinny query side")
    val centroidLits = centroidStructs(index)
    val probed = qRaw
      .select(col("query_id"), col("qvec"), col("qnorm"),
        explode(array(centroidLits.toSeq: _*)).as("cc"))
      .select(col("query_id"), col("cc.cell").as("cell"),
        (col("qnorm") * col("cc.halfnormsq")
          - dot(col("qvec"), col("cc.centroid"))).as("cdist"))
      // NaN guard: probeCells' ASC window sorts a NaN cdist LAST (never
      // selected while finite cells exist), but TopKBy's total order on
      // -cdist would sort the same NaN FIRST — a NaN-bearing query
      // vector would select opposite cells between the two probe forms.
      // Mapping NaN → +Inf restores "never selected over a finite cell"
      // here too (the residual divergence — a genuine +Inf cdist ties
      // with a mapped NaN instead of ranking above it — cannot promote
      // a non-finite cell over a finite one).
      .withColumn("cdist", when(isnan(col("cdist")),
        lit(Double.PositiveInfinity)).otherwise(col("cdist")))
      .groupBy("query_id")
      .agg(graft.functions.TopKBy.topKBy(-col("cdist"), col("cell"),
        col("cell"), nprobe).as("top"))
      .select(col("query_id"), explode(col("top.tie")).as("cell"))
    probed.join(qRaw, "query_id")
      .select(col("query_id"), col("qvec"), col("qnorm"), col("cell"))
  }

  /** [[graft.dedup.Dedup]]'s double-evaluation guard, duplicated here
    * (it is private there by design): a plan containing Sample/Limit or
    * a nondeterministic expression must not be referenced twice.
    */
  private def assertDeterministic(df: DataFrame, what: String): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val bad = df.queryExecution.analyzed.collectFirst {
      case _: Sample => "a Sample"
      case _: LocalLimit => "a Limit"
      case _: GlobalLimit => "a Limit"
      case p if p.expressions.exists(!_.deterministic) =>
        "a nondeterministic expression"
    }
    require(bad.isEmpty,
      s"$what plan contains ${bad.get}: its two evaluations (skinny " +
        "probe, then wide join-back) could disagree — localCheckpoint it first")
  }

  /** The centroid table as a foldable literal array of
    * (cell, centroid, halfnormsq) structs — shared by both probe forms.
    */
  private def centroidStructs(index: IvfIndex) =
    index.centroids.map { case (i, c) =>
      struct(lit(i).as("cell"), array(c.map(lit).toSeq: _*).as("centroid"),
        lit(c.map(x => x * x).sum / 2).as("halfnormsq"))
    }

  /** Radius (range) search over the IVF index: every corpus vector with
    * `cosine >= minSim` of each query, scanning only the probed cells —
    * the dedup/retrieval form of the index probe (near-dup audits ask
    * "everything this similar", not "the top k"). Same broadcast probe
    * equi-join shape as [[queryIvf]] with a threshold filter instead of
    * a rank window — no per-query sort at all. At `nprobe == nlist` the
    * result is the EXACT radius set (every pair scored once via the
    * cell join).
    */
  def queryIvfRadius(index: IvfIndex, queries: DataFrame, idCol: String,
                     vecCol: String, minSim: Double, nprobe: Int): DataFrame = {
    val qRaw = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      norm(col(vecCol)).as("qnorm"))
    val probed = probeCells(index, qRaw, nprobe)
    index.cells.join(broadcast(probed), "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine_sim",
        dot(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")))
      .filter(col("cosine_sim") >= minSim)
      .select("query_id", "neighbor_id", "cosine_sim")
  }

  /** Query an IVF index: score each query only against the members of its
    * `nprobe` nearest cells. Candidate generation is a hash equi-join on
    * `cell` (queries carry their probed cells exploded), never a cross
    * join; the probe side broadcasts, so on a partitioned index the join
    * triggers dynamic partition pruning of the cells scan. With
    * `nprobe == nlist` the result equals [[bruteForceTopK]] bit-exactly:
    * every (query, corpus) pair is scored once via the hash join, with
    * the identical `dot/(qnorm·cnorm)` formula over the raw vectors.
    */
  def queryIvf(index: IvfIndex, queries: DataFrame, idCol: String,
               vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val scored = scoreIvf(index, queries, idCol, vecCol, nprobe)
    val w = Window.partitionBy("query_id").orderBy(desc("cosine_sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine_sim", "rank")
  }

  /** [[queryIvf]]'s candidate generation + scoring WITHOUT the top-k
    * rank window: (query_id, neighbor_id, cosine_sim) for every pair the
    * probe surfaces. The entry point for consumers that apply their own
    * bounded contraction (e.g. the MMR pool's `top_k_by`) — tacking the
    * rank window on first would sort every query's full candidate list
    * in one task just to throw the ordering away.
    */
  def scoreIvf(index: IvfIndex, queries: DataFrame, idCol: String,
               vecCol: String, nprobe: Int): DataFrame = {
    val qRaw = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      norm(col(vecCol)).as("qnorm"))
    val probed = probeCells(index, qRaw, nprobe)
    index.cells.join(broadcast(probed), "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine_sim",
        dot(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")))
  }

  /** All-points k-nearest-neighbor GRAPH over the corpus through an IVF
    * index: every corpus vector becomes a query, probed against its
    * `nprobe` nearest cells. Two deliberate departures from the
    * query-set path in [[queryIvf]], both load-bearing at scale:
    *
    *  - the cell join is a plain SHUFFLE equi-join — the probe side here
    *    IS the corpus, so the broadcast that makes a query-set probe
    *    map-only would ship the whole corpus to every executor;
    *  - the per-point top-k runs as the bounded-heap `top_k_by`
    *    aggregate, not a rank window: map-side partials contract each
    *    partition to ≤ k candidates per point before the exchange, so
    *    shuffle and memory stay k-bounded no matter how large a cell
    *    gets.
    *
    * Pair-scoring cost is corpus × nprobe × avg-cell-size — the standard
    * IVF KNN-graph bound, never all-pairs. At `nprobe == nlist` the
    * graph is EXACT (every pair scored once via the cell join), which is
    * how the recall contract's ground truth is produced. Ranking is
    * (cosine DESC, neighbor_id ASC), bit-identical to [[queryIvf]].
    * Output: (query_id, neighbor_id, cosine_sim, rank).
    */
  def knnGraph(index: IvfIndex, corpus: DataFrame, idCol: String,
               vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val qRaw = corpus.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      norm(col(vecCol)).as("qnorm"))
    heapTopK(
      shuffleProbeScored(index, qRaw, nprobe)
        .filter(col("neighbor_id") =!= col("query_id")),
      k)
  }

  /** Cross-corpus approximate-nearest-neighbor JOIN: every row of an
    * EXTERNAL query corpus A against a (different) indexed corpus B,
    * top-k B-neighbors per A-row — the retrieval-augmentation /
    * dedup-against-reference-corpus primitive (A ≠ B, so there is no
    * self-match to exclude; matching ids across the two id spaces are
    * distinct entities and must surface).
    *
    * Scale shape is [[knnGraph]]'s, not [[queryIvf]]'s: corpus A is
    * corpus-sized, so the probe side is a plain SHUFFLE cell equi-join
    * (a broadcast would ship all of A to every executor), and the
    * per-row top-k is the bounded-heap `top_k_by` aggregate (map-side
    * partials keep ≤ k candidates per A-row per partition — no
    * per-query candidate sort, no rank exchange carrying vectors).
    * Cost is |A| × nprobe × avg-cell(B) — never |A|×|B|. At
    * `nprobe == nlist` the join is EXACT.
    *
    * `roundTo = Some(d)` ranks on the d-decimal ROUNDED cosine
    * (neighbor_id ascending tiebreak) and emits the rounded value —
    * the engine-portable cut convention that lets an independent SQL
    * engine replay the identical selection.
    *
    * PRECONDITION: A's ids are unique. The per-row top-k groups by
    * `query_id`, so a duplicated A-id with two different vectors would
    * silently pool both candidate sets into one blended top-k
    * (the same feature-store contract as [[graft.similarity.Pq.encode]],
    * which guards it in-plan; here the guard would cost an extra
    * corpus-sized exchange of A, so the contract is documented
    * instead — dedup A first if its key isn't trusted). [[knnGraph]]
    * shares the same assumption about its corpus ids.
    */
  def annJoin(index: IvfIndex, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nprobe: Int,
              roundTo: Option[Int] = None): DataFrame = {
    val qRaw = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      norm(col(vecCol)).as("qnorm"))
    val scored = shuffleProbeScored(index, qRaw, nprobe)
    heapTopK(
      roundTo.fold(scored)(d =>
        scored.withColumn("cosine_sim", round(col("cosine_sim"), d))),
      k)
  }

  /** The corpus-sized-probe candidate scorer [[knnGraph]] and [[annJoin]]
    * share: shuffle equi-join on `cell` (probe side NOT broadcast),
    * exact cosine per surfaced pair.
    */
  private def shuffleProbeScored(index: IvfIndex, qRaw: DataFrame,
                                 nprobe: Int): DataFrame = {
    // The join OUTPUT (|A| x nprobe x avg-cell candidates) is orders of
    // magnitude larger than either INPUT (skinny probe rows, cell rows),
    // and the partial top-k heap runs INSIDE the join's stage — so the
    // stage's width must track the output, not the inputs. Left alone,
    // both planner paths under-parallelize on input-size evidence
    // (caught by the round-17 sf1 gate: 100M candidates through 2
    // tasks):
    //  - shuffle-join form: AQE coalesces the exchanges to input bytes;
    //  - broadcast form (AQE demotes a small index side): the stage
    //    inherits the query table's RAW SCAN partitioning (2 file
    //    splits at sf1).
    // Pinning BOTH sides with explicit repartitions — which AQE leaves
    // alone — restores output-side parallelism in either form: the
    // query side on query_id (which also co-partitions
    // probeCellsSkinny's internal join-back for free), the cells side
    // on the join key. Cost is at most one extra skinny exchange of A;
    // at real scale both tables arrive wider than `parts` anyway.
    val spark = qRaw.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism,
      spark.sessionState.conf.numShufflePartitions)
    val q = qRaw.repartition(parts, col("query_id"))
    index.cells.repartition(parts, col("cell"))
      .join(probeCellsSkinny(index, q, nprobe), "cell")
      .withColumn("cosine_sim",
        dot(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")))
  }

  /** Bounded-heap per-query top-k over a scored pair stream: ranking is
    * (cosine_sim DESC, neighbor_id ASC), bit-identical to [[queryIvf]].
    * Output: (query_id, neighbor_id, cosine_sim, rank).
    */
  private def heapTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(graft.functions.TopKBy.topKBy(col("cosine_sim"), col("neighbor_id"),
        struct(col("neighbor_id"), col("cosine_sim")), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.payload.neighbor_id").as("neighbor_id"),
        col("col.payload.cosine_sim").as("cosine_sim"),
        (col("pos") + 1).cast("int").as("rank"))

  /** One-shot IVF approximate top-k: build + query in a single call (no
    * persisted index). Prefer [[buildIvfIndex]]/[[writeIvfIndex]]/
    * [[queryIvf]] when the corpus is served more than once.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int, nprobe: Int,
              seed: Long = 42L): DataFrame =
    queryIvf(buildIvfIndex(corpus, idCol, vecCol, nlist, seed),
      queries, idCol, vecCol, k, nprobe)

  /** Deterministic random hyperplanes (seeded driver-side RNG, broadcast as
    * a literal array-of-arrays) for signed-random-projection LSH.
    */
  def randomPlanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new Random(seed)
    Array.fill(numPlanes, dim)(rng.nextGaussian())
  }

  /** SRP bucket key: one sign bit per hyperplane, concatenated to a string
    * key. Vectors in the same bucket are near-duplicate candidates.
    */
  def srpBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.map { p =>
      val plane = array(p.map(lit): _*)
      when(dot(vec, plane) >= 0, "1").otherwise("0")
    }
    concat(bits.toSeq: _*)
  }

  /** Approximate near-dup pairs: equi-join on SRP bucket, then exact cosine
    * verify within buckets. With `numPlanes` bits, expected bucket count is
    * 2^numPlanes — pick numPlanes ≈ log2(corpusSize / targetBucketSize).
    */
  def srpNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                      threshold: Double, numPlanes: Int, dim: Int,
                      seed: Long = 42L): DataFrame = {
    val planes = randomPlanes(numPlanes, dim, seed)
    val bucketed = corpus.select(col(idCol), col(vecCol),
      srpBucket(col(vecCol), planes).as("bucket"),
      norm(col(vecCol)).as("nrm"))
    val a = bucketed.select(col("bucket"), col(idCol).as("id_a"),
      col(vecCol).as("vec_a"), col("nrm").as("norm_a"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id_b"),
      col(vecCol).as("vec_b"), col("nrm").as("norm_b"))
    a.join(b, "bucket")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine_sim",
        dot(col("vec_a"), col("vec_b")) / (col("norm_a") * col("norm_b")))
      .filter(col("cosine_sim") >= threshold)
      .select("id_a", "id_b", "cosine_sim")
    // no trailing distinct: each vector has exactly ONE bucket string,
    // so the equi-join yields each (id_a, id_b) at most once — a dedup
    // here would cost a full extra shuffle of the verified pair set
    // (and the DuckDB oracle replay carries no DISTINCT either)
  }
}
