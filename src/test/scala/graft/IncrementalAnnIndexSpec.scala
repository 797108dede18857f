package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.similarity.Similarity
import graft.streaming.IncrementalAnnIndex

/** Streaming IVF index maintenance: bootstrap-then-append through the
  * streaming runner, exactly-once append under crash replays (the
  * batch-marker + deterministic-file-name protocol), and the
  * drift-triggered refit on its batch cadence.
  */
class IncrementalAnnIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // the SimilaritySpec drift fixture: two tight blobs on axes (the
  // build distribution) and one 45-degree blob between them (the
  // out-of-distribution append that drives the ratio up)
  private def blob(center: Array[Double], n: Int, jitterAxis: Int, idBase: Long) =
    (0 until n).map { i =>
      val v = center.clone()
      v(jitterAxis) += 0.03 * ((i % 7) - 3)
      (idBase + i, v.map(_.toFloat))
    }
  private def blobA = blob(Array(1, 0, 0, 0), 30, 2, 0L) ++
    blob(Array(0, 1, 0, 0), 30, 2, 100L)
  private def blobB = blob(Array(0.7071, 0.7071, 0, 0), 20, 0, 200L)

  private def writeBatch(dir: Path, rows: Seq[(Long, Array[Float])]): Unit =
    rows.toDF("vec_id", "embedding").coalesce(1)
      .write.mode("append").parquet(dir.toString)

  private def runOnce(in: Path, index: Path, ckpt: Path,
                      refitAt: Double = 1000.0, driftCheckEvery: Int = 0): Unit = {
    val vecs = spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
      .parquet(in.toString)
    IncrementalAnnIndex.run(vecs, "vec_id", "embedding",
      index.toString, ckpt.toString, nlist = 2,
      refitAt = refitAt, driftCheckEvery = driftCheckEvery)
      .awaitTermination()
  }

  test("bootstrap, append across restart, idle restart — index stays exact at full probe") {
    val base = Files.createTempDirectory("graft-annidx")
    val (in, index, ckpt) =
      (base.resolve("in"), base.resolve("index"), base.resolve("ckpt"))
    Files.createDirectories(in)

    writeBatch(in, blobA)
    runOnce(in, index, ckpt)
    val built = Similarity.readIvfIndex(spark, index.toString)
    assert(built.cells.count() == 60, "bootstrap must index the first batch")

    // restart with new vectors: appended to the frozen quantizer
    writeBatch(in, blobB)
    runOnce(in, index, ckpt)
    val grown = Similarity.readIvfIndex(spark, index.toString)
    assert(grown.cells.count() == 80, "append must grow the cells table")

    // full probe over the grown index finds a B member's true B neighbor
    val queries = blobB.take(1).toDF("vec_id", "embedding")
    val res = Similarity.queryIvf(grown, queries, "vec_id", "embedding",
      k = 3, nprobe = grown.centroids.length)
      .collect().map(_.getLong(1)).toSet
    assert(res.exists(_ >= 200L), s"appended members must be probeable, got $res")

    // idle restart: nothing new, nothing duplicated
    runOnce(in, index, ckpt)
    assert(Similarity.readIvfIndex(spark, index.toString).cells.count() == 80)
  }

  test("crash replays never double-append: committed, uncommitted, and partial windows") {
    val base = Files.createTempDirectory("graft-annidx-replay")
    val index = base.resolve("index")
    val b0 = blobA.toDF("vec_id", "embedding")
    val b1 = blobB.toDF("vec_id", "embedding")
    def process(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      IncrementalAnnIndex.processBatch(df, id, "vec_id", "embedding",
        index.toString, nlist = 2, refitAt = 1000.0, driftCheckEvery = 0, seed = 42L)
    def rows(): Long = spark.read.parquet(s"$index/cells").count()

    process(b0, 0L)
    assert(rows() == 60)
    // bootstrap replay (crash after build, before the append marker):
    // the _bootstrap marker routes it back to the idempotent rebuild
    val fs = new org.apache.hadoop.fs.Path(index.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$index/_appended/0"), false)
    process(b0, 0L)
    assert(rows() == 60, "bootstrap replay must rebuild, not append")

    process(b1, 1L)
    assert(rows() == 80)
    // committed replay: marker present -> no-op
    process(b1, 1L)
    assert(rows() == 80, "a committed batch must replay as a no-op")

    // uncommitted replay (crash after the renames, before the marker):
    // cleanup by deterministic file name, then re-append — still 80
    fs.delete(new org.apache.hadoop.fs.Path(s"$index/_appended/1"), false)
    process(b1, 1L)
    assert(rows() == 80, "an uncommitted replay must converge, not double-append")

    // partial replay (crash mid-rename): drop ONE of the batch's files,
    // delete the marker — replay must restore exactly the batch's rows
    val placed = fs.globStatus(new org.apache.hadoop.fs.Path(s"$index/cells/cell=*/b1-*"))
    assert(placed.nonEmpty)
    fs.delete(placed.head.getPath, false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$index/_appended/1"), false)
    process(b1, 1L)
    assert(rows() == 80, "a partial replay must converge to exactly-once")
  }

  test("a drifted index heals at stream (re)start — the crashed-refit window") {
    val base = Files.createTempDirectory("graft-annidx-restart")
    val (in, index, ckpt) =
      (base.resolve("in"), base.resolve("index"), base.resolve("ckpt"))
    Files.createDirectories(in)
    // bootstrap + OOD append with the refit threshold effectively OFF —
    // the state a crash mid-refit leaves behind (markers committed,
    // index still drifted)
    writeBatch(in, blobA)
    runOnce(in, index, ckpt)
    writeBatch(in, blobB)
    runOnce(in, index, ckpt)
    assert(Similarity.ivfDrift(spark, index.toString).ratio > 2.0,
      "precondition: the index must be drifted")
    // restart with the real threshold and NOTHING new to process: the
    // startup check must refit even though no batch fires the cadence
    runOnce(in, index, ckpt, refitAt = 2.0, driftCheckEvery = 5)
    val healed = Similarity.ivfDrift(spark, index.toString)
    assert(math.abs(healed.ratio - 1.0) < 1e-6,
      s"restart must heal a drifted index, got $healed")
    assert(Similarity.readIvfIndex(spark, index.toString).cells.count() == 80)
  }

  test("skew-triggered refit: hot-cell appends grow nlist on the cadence and rebalance") {
    // SimilaritySpec's cell-skew refit fixture through the streaming
    // maintainer: 4 balanced blobs bootstrap a 4-cell index; the append
    // batch piles structured mass (two ±0.15 sub-blobs, splittable)
    // entirely into blob A's frozen cell. refitAt = 0 isolates the SKEW
    // trigger: the drift ratio also moves here, and maintenance must
    // fire on cellSkew alone.
    def blob5(center: Array[Double], n: Int, idBase: Long) =
      (0 until n).map { i =>
        val v = center.clone()
        v(4) += 0.01 * ((i % 5) - 2)
        (idBase + i, v.map(_.toFloat))
      }
    val base = Files.createTempDirectory("graft-annidx-skew")
    val index = base.resolve("index")
    def process(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      IncrementalAnnIndex.processBatch(df, id, "vec_id", "embedding",
        index.toString, nlist = 4, refitAt = 0.0, driftCheckEvery = 1,
        seed = 42L, skewRefitAt = 3.0)

    process((blob5(Array(1, 0, 0, 0, 0), 20, 0L) ++
      blob5(Array(0, 1, 0, 0, 0), 20, 100L) ++
      blob5(Array(0, 0, 1, 0, 0), 20, 200L) ++
      blob5(Array(0, 0, 0, 1, 0), 20, 300L)).toDF("vec_id", "embedding"), 0L)
    val fresh = Similarity.ivfDrift(spark, index.toString)
    assert(fresh.cellSkew < 3.0, s"precondition: balanced bootstrap, got $fresh")

    // 80 appended rows, all nearest the frozen x centroid: pre-refit
    // populations (100, 20, 20, 20) -> skew 5 > 3, so THIS batch's own
    // cadence check (batchId 1, driftCheckEvery 1) must refit with
    // nlist grown to hold the build-time average cell size:
    // ceil(4 * 160 / 80) = 8
    process((blob5(Array(1, 0.15, 0, 0, 0), 40, 1000L) ++
      blob5(Array(1, -0.15, 0, 0, 0), 40, 1100L)).toDF("vec_id", "embedding"), 1L)
    val after = Similarity.ivfDrift(spark, index.toString)
    val idx = Similarity.readIvfIndex(spark, index.toString)
    assert(idx.centroids.length == 8,
      s"skew refit must grow nlist 4 -> 8, got ${idx.centroids.length}")
    assert(after.cellSkew < 3.0,
      s"the grown-nlist refit must rebalance under the threshold, got $after")
    assert(idx.cells.count() == 160, "refit must keep every vector")
  }

  test("maintainFit refuses while an uncommitted append batch is pending (restart refit window)") {
    // the crash state run()'s restart check can see: batch 1's cells
    // files are renamed in but its _appended marker never committed. A
    // refit here would rebuild those rows into anonymous part files the
    // replay's deterministic b1-* cleanup cannot find — the replay
    // would then append the batch a SECOND time. maintainFit must
    // refuse (reencodeIfStale's veto), and refit normally once the
    // replay has converged the batch.
    val base = Files.createTempDirectory("graft-annidx-refitveto")
    val index = base.resolve("index")
    val b0 = blobA.toDF("vec_id", "embedding")
    val b1 = blobB.toDF("vec_id", "embedding")
    def process(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      IncrementalAnnIndex.processBatch(df, id, "vec_id", "embedding",
        index.toString, nlist = 2, refitAt = 1000.0, driftCheckEvery = 0,
        seed = 42L)
    process(b0, 0L)
    process(b1, 1L)
    assert(Similarity.ivfDrift(spark, index.toString).ratio > 2.0,
      "precondition: the appended index must be drifted")
    // simulate the crash: marker gone, batch-1 cells files still present
    val fs = new org.apache.hadoop.fs.Path(index.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$index/_appended/1"), false)

    IncrementalAnnIndex.maintainFit(spark, index.toString,
      refitAt = 2.0, skewRefitAt = 0.0, seed = 42L)
    assert(Similarity.ivfDrift(spark, index.toString).ratio > 2.0,
      "maintainFit must refuse to refit over an uncommitted append")
    assert(fs.globStatus(new org.apache.hadoop.fs.Path(
        s"$index/cells/cell=*/b1-*")).nonEmpty,
      "the uncommitted batch's deterministic file names must survive")

    // the replay converges the batch, then maintenance may proceed
    process(b1, 1L)
    assert(spark.read.parquet(s"$index/cells").count() == 80,
      "the replay must converge to exactly-once")
    IncrementalAnnIndex.maintainFit(spark, index.toString,
      refitAt = 2.0, skewRefitAt = 0.0, seed = 42L)
    val healed = Similarity.ivfDrift(spark, index.toString)
    assert(math.abs(healed.ratio - 1.0) < 1e-6,
      s"post-replay maintenance must refit, got $healed")
    assert(Similarity.readIvfIndex(spark, index.toString).cells.count() == 80,
      "refit must keep every vector exactly once")
  }

  private val sq8Encoder: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
    df => graft.similarity.Sq.encode(df, "vec_id", "vec")

  test("inline sidecar encode: streamed batches land codes atomically with the append") {
    val base = Files.createTempDirectory("graft-annidx-enc")
    val (in, index, ckpt) =
      (base.resolve("in"), base.resolve("index"), base.resolve("ckpt"))
    Files.createDirectories(in)
    def runEnc(): Unit = {
      val vecs = spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
        .parquet(in.toString)
      IncrementalAnnIndex.run(vecs, "vec_id", "embedding",
        index.toString, ckpt.toString, nlist = 2,
        refitAt = 1000.0, driftCheckEvery = 0, encoder = Some(sq8Encoder))
        .awaitTermination()
    }
    writeBatch(in, blobA)
    runEnc() // bootstrap: index + full sidecar
    assert(IncrementalAnnIndex.unencodedCount(spark, index.toString) == 0,
      "bootstrap must encode the whole initial corpus")
    writeBatch(in, blobB)
    runEnc() // append: cells AND codes grow together
    assert(spark.read.parquet(s"$index/cells").count() == 80)
    assert(IncrementalAnnIndex.readEncoded(spark, index.toString).count() == 80,
      "a streamed append must encode inline — no fallback delta accumulates")
    assert(IncrementalAnnIndex.unencodedCount(spark, index.toString) == 0)

    // post-append quantized search serves the PURE int8 path (zero rows
    // through the exact-rerank anti-join fallback) and, at full probe +
    // full shortlist, equals the exact float result — the Sq contract
    val idx = Similarity.readIvfIndex(spark, index.toString)
    val enc = IncrementalAnnIndex.readEncoded(spark, index.toString)
    val queries = blobB.take(2).toDF("vec_id", "embedding")
    val fallbackRows = idx.cells
      .join(enc.select(col("vec_id").as("neighbor_id")), Seq("neighbor_id"), "left_anti")
      .count()
    assert(fallbackRows == 0, "every cell member must have a code")
    val sq = graft.similarity.Sq.ivfSq8TopK(idx, enc, queries,
      "vec_id", "embedding", k = 3, nprobe = idx.centroids.length, shortlist = 100)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    val exact = Similarity.queryIvf(idx, queries, "vec_id", "embedding",
      k = 3, nprobe = idx.centroids.length)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    assert(sq == exact, "full-probe full-shortlist SQ8 over the sidecar must equal exact")
  }

  test("sidecar crash replays never double codes; out-of-band delta heals on threshold") {
    val base = Files.createTempDirectory("graft-annidx-reenc")
    val index = base.resolve("index")
    def process(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      IncrementalAnnIndex.processBatch(df, id, "vec_id", "embedding",
        index.toString, nlist = 2, refitAt = 1000.0, driftCheckEvery = 2,
        seed = 42L, encoder = Some(sq8Encoder), reencodeAt = 0.1)
    def encRows(): Long =
      IncrementalAnnIndex.readEncoded(spark, index.toString).count()

    process(blobA.toDF("vec_id", "embedding"), 0L) // bootstrap
    process(blobB.toDF("vec_id", "embedding"), 1L) // inline-encoded append
    assert(encRows() == 80)

    // uncommitted replay (crash after the renames, before the marker):
    // both cells b1-* and sidecar e1-* files are cleaned and re-landed
    val fs = new org.apache.hadoop.fs.Path(index.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$index/_appended/1"), false)
    process(blobB.toDF("vec_id", "embedding"), 1L)
    assert(encRows() == 80, "an uncommitted replay must not double the codes")
    assert(spark.read.parquet(s"$index/cells").count() == 80)

    // partial sidecar replay (crash mid-encode-rename): drop ONE of the
    // batch's code files + the marker — the replay must restore exactly
    // the batch's codes, not stack a second copy next to the survivors
    val placedE = fs.globStatus(new org.apache.hadoop.fs.Path(
      s"${IncrementalAnnIndex.encodedDir(index.toString)}/e1-*"))
    assert(placedE.nonEmpty)
    fs.delete(placedE.head.getPath, false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$index/_appended/1"), false)
    process(blobB.toDF("vec_id", "embedding"), 1L)
    assert(encRows() == 80, "a partial sidecar replay must converge to exactly-once")

    // out-of-band append (plain batch API, outside the stream): cells
    // grow, sidecar lags — quantized search falls back to the exact
    // branch for those rows but stays CORRECT
    val extra = blob(Array(0, 0, 1, 0), 20, 1, 300L)
    Similarity.appendToIvfIndex(spark, index.toString,
      extra.toDF("vec_id", "embedding"), "vec_id", "embedding")
    assert(IncrementalAnnIndex.unencodedCount(spark, index.toString) == 20)
    val idx = Similarity.readIvfIndex(spark, index.toString)
    val queries = extra.take(1).toDF("vec_id", "embedding")
    val viaFallback = graft.similarity.Sq.ivfSq8TopK(idx,
      IncrementalAnnIndex.readEncoded(spark, index.toString), queries,
      "vec_id", "embedding", k = 3, nprobe = idx.centroids.length, shortlist = 200)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    val exact = Similarity.queryIvf(idx, queries, "vec_id", "embedding",
      k = 3, nprobe = idx.centroids.length)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    assert(viaFallback == exact,
      "unencoded members must be served exactly via the anti-join branch")

    // the next cadence batch (batchId % driftCheckEvery == 0) measures
    // the 20/100 delta > 0.1 and re-encodes: back to the pure int8 path
    process(Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"), 2L)
    assert(IncrementalAnnIndex.unencodedCount(spark, index.toString) == 0,
      "the cadence re-encode must clear the out-of-band delta")
    assert(encRows() == 100)

    // below-threshold deltas do NOT trigger (bounded fallback is cheaper
    // than a full-table re-encode): 5/105 < 0.1 stays unencoded
    val tiny = blob(Array(0, 0, 0, 1), 5, 0, 400L)
    Similarity.appendToIvfIndex(spark, index.toString,
      tiny.toDF("vec_id", "embedding"), "vec_id", "embedding")
    assert(!IncrementalAnnIndex.reencodeIfStale(spark, index.toString,
      sq8Encoder, reencodeAt = 0.1))
    assert(IncrementalAnnIndex.unencodedCount(spark, index.toString) == 5)
    // ... and a direct maintenance call with a tighter threshold heals it
    assert(IncrementalAnnIndex.reencodeIfStale(spark, index.toString,
      sq8Encoder, reencodeAt = 0.0))
    assert(IncrementalAnnIndex.unencodedCount(spark, index.toString) == 0)
  }

  test("the sidecar protocol is encoder-agnostic: a PQ-codebook closure serves ivfPqTopK") {
    // the PQ variant of the maintenance loop: a codebook trained on the
    // first corpus, closed over in the encoder (the loadCodebook
    // restart pattern) — streamed batches encode to (vec_id, codes)
    // under the same markers, and full-probe IVFPQ over the sidecar
    // equals exact
    val base = Files.createTempDirectory("graft-annidx-pq")
    val index = base.resolve("index")
    val cb = graft.similarity.Pq.buildCodebook(
      blobA.toDF("vec_id", "embedding"), "vec_id", "embedding",
      m = 2, ksub = 4, dim = 4, iters = 3, seed = 7L)
    val pqEncoder: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => graft.similarity.Pq.encode(df, "vec_id", "vec", cb)
    def process(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      IncrementalAnnIndex.processBatch(df, id, "vec_id", "embedding",
        index.toString, nlist = 2, refitAt = 1000.0, driftCheckEvery = 0,
        seed = 42L, encoder = Some(pqEncoder), reencodeAt = 0.1)
    process(blobA.toDF("vec_id", "embedding"), 0L)
    process(blobB.toDF("vec_id", "embedding"), 1L)
    assert(IncrementalAnnIndex.unencodedCount(spark, index.toString) == 0)
    val idx = Similarity.readIvfIndex(spark, index.toString)
    val enc = IncrementalAnnIndex.readEncoded(spark, index.toString)
    assert(enc.columns.toSet == Set("vec_id", "codes"), "PQ sidecar schema")
    val queries = blobB.take(2).toDF("vec_id", "embedding")
    val pq = graft.similarity.Pq.ivfPqTopK(idx, enc, cb, queries,
      "vec_id", "embedding", k = 3, nprobe = idx.centroids.length, shortlist = 100)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    val exact = Similarity.queryIvf(idx, queries, "vec_id", "embedding",
      k = 3, nprobe = idx.centroids.length)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    assert(pq == exact,
      "full-probe full-shortlist IVFPQ over the streamed sidecar must equal exact")

    // the codebook-swap recipe: counts match so the threshold path
    // correctly sees nothing stale, but the FORCED reencode rewrites
    // the sidecar under the new encoder (here: swap PQ codes for SQ8)
    assert(!IncrementalAnnIndex.reencodeIfStale(spark, index.toString,
      sq8Encoder, reencodeAt = 0.0),
      "a zero delta must not trip the staleness gate")
    assert(IncrementalAnnIndex.reencode(spark, index.toString, sq8Encoder))
    val swapped = IncrementalAnnIndex.readEncoded(spark, index.toString)
    assert(swapped.columns.toSet == Set("vec_id", "sq_scale", "sq_code"),
      "the forced reencode must serve the NEW encoder's codes")
    assert(swapped.count() == 80)
    assert(IncrementalAnnIndex.unencodedCount(spark, index.toString) == 0)
  }

  test("OPQ rotation swap: a refreshed fitRotation re-encodes the sidecar and serves exactly") {
    // the rotation-swap case of the codebook-swap recipe: an OPQ encoder
    // whose rotation was refit on newer data replaces the sidecar codes
    // through the same forced-reencode path, and full-probe IVFOPQ over
    // the swapped sidecar still equals exact — the full OPQ lifecycle
    // (bootstrap -> append -> rotation refresh -> swap) crash-windowed
    // like PQ/SQ8
    val base = Files.createTempDirectory("graft-annidx-opq")
    val index = base.resolve("index")
    def opqEncoderOf(model: graft.similarity.Opq.OpqModel) =
      (df: org.apache.spark.sql.DataFrame) =>
        graft.similarity.Opq.encode(df, "vec_id", "vec", model)
    // v1 model: rotation + codebook fit on blob A only
    val v1 = graft.similarity.Opq.train(blobA.toDF("vec_id", "embedding"),
      "vec_id", "embedding", m = 2, ksub = 4, dim = 4, iters = 3, seed = 7L)
    def process(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      IncrementalAnnIndex.processBatch(df, id, "vec_id", "embedding",
        index.toString, nlist = 2, refitAt = 1000.0, driftCheckEvery = 0,
        seed = 42L, encoder = Some(opqEncoderOf(v1)), reencodeAt = 0.1)
    process(blobA.toDF("vec_id", "embedding"), 0L)
    process(blobB.toDF("vec_id", "embedding"), 1L)
    assert(IncrementalAnnIndex.unencodedCount(spark, index.toString) == 0)
    // v2 model: rotation REFIT over the grown corpus (A ∪ B) — the
    // drift-driven refresh a long-lived OPQ deployment performs
    val grown = (blobA ++ blobB).toDF("vec_id", "embedding")
    val v2 = graft.similarity.Opq.train(grown, "vec_id", "embedding",
      m = 2, ksub = 4, dim = 4, iters = 3, seed = 11L)
    assert(!IncrementalAnnIndex.reencodeIfStale(spark, index.toString,
      opqEncoderOf(v2), reencodeAt = 0.0),
      "a zero delta must not trip the staleness gate")
    assert(IncrementalAnnIndex.reencode(spark, index.toString, opqEncoderOf(v2)))
    assert(IncrementalAnnIndex.unencodedCount(spark, index.toString) == 0)
    // the swapped sidecar serves the v2 model exactly at full probe
    val idx = Similarity.readIvfIndex(spark, index.toString)
    val enc = IncrementalAnnIndex.readEncoded(spark, index.toString)
    val queries = blobB.take(2).toDF("vec_id", "embedding")
    val opq = graft.similarity.Opq.ivfOpqTopK(idx, enc, v2, queries,
      "vec_id", "embedding", k = 3, nprobe = idx.centroids.length, shortlist = 100)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    val exact = Similarity.queryIvf(idx, queries, "vec_id", "embedding",
      k = 3, nprobe = idx.centroids.length)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    assert(opq == exact,
      "full-probe full-shortlist IVFOPQ over the rotation-swapped sidecar must equal exact")
  }

  test("re-encode refuses while an uncommitted batch is pending (the restart race)") {
    // the double-encode window: a crash lands batch 1's cells renames
    // but not its marker; a restart-time re-encode would fold those
    // rows into anonymous part files, and the replay's inline encode
    // would then land the same vectors a SECOND time
    val base = Files.createTempDirectory("graft-annidx-race")
    val index = base.resolve("index")
    def process(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      IncrementalAnnIndex.processBatch(df, id, "vec_id", "embedding",
        index.toString, nlist = 2, refitAt = 1000.0, driftCheckEvery = 0,
        seed = 42L, encoder = Some(sq8Encoder), reencodeAt = 0.0)
    process(blobA.toDF("vec_id", "embedding"), 0L)
    process(blobB.toDF("vec_id", "embedding"), 1L)
    val fs = new org.apache.hadoop.fs.Path(index.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the crash window: cells + sidecar files landed, marker gone
    fs.delete(new org.apache.hadoop.fs.Path(s"$index/_appended/1"), false)
    // ... and also delete batch 1's sidecar files, the worst variant
    // (delta = the whole batch — far past any threshold)
    fs.globStatus(new org.apache.hadoop.fs.Path(
      s"${IncrementalAnnIndex.encodedDir(index.toString)}/e1-*"))
      .foreach(st => fs.delete(st.getPath, false))
    assert(IncrementalAnnIndex.unencodedCount(spark, index.toString) == 20)
    assert(!IncrementalAnnIndex.reencodeIfStale(spark, index.toString,
      sq8Encoder, reencodeAt = 0.0),
      "a pending uncommitted batch must veto the re-encode")
    // the replay converges to exactly-once in BOTH tables...
    process(blobB.toDF("vec_id", "embedding"), 1L)
    assert(spark.read.parquet(s"$index/cells").count() == 80)
    assert(IncrementalAnnIndex.readEncoded(spark, index.toString).count() == 80,
      "the replayed inline encode must land the batch's codes exactly once")
    // ...after which maintenance is allowed again (nothing pending)
    assert(!IncrementalAnnIndex.reencodeIfStale(spark, index.toString,
      sq8Encoder, reencodeAt = 0.0) ||
      IncrementalAnnIndex.unencodedCount(spark, index.toString) == 0)
    assert(IncrementalAnnIndex.unencodedCount(spark, index.toString) == 0)
  }

  test("drift past the threshold triggers the atomic refit on the check cadence") {
    val base = Files.createTempDirectory("graft-annidx-drift")
    val index = base.resolve("index")
    def process(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      IncrementalAnnIndex.processBatch(df, id, "vec_id", "embedding",
        index.toString, nlist = 2, refitAt = 2.0, driftCheckEvery = 2, seed = 42L)

    process(blobA.toDF("vec_id", "embedding"), 0L)         // bootstrap
    process(blobB.toDF("vec_id", "embedding"), 1L)         // OOD append, no check yet
    assert(Similarity.ivfDrift(spark, index.toString).ratio > 2.0,
      "precondition: the OOD append must push drift past the refit threshold")

    // batch 2 hits the cadence: drift is checked and the refit fires
    process(Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"), 2L)
    val after = Similarity.ivfDrift(spark, index.toString)
    assert(math.abs(after.ratio - 1.0) < 1e-6,
      s"the refit must restore drift to ~1, got $after")
    assert(Similarity.readIvfIndex(spark, index.toString).cells.count() == 80,
      "the refit must never lose or duplicate a vector")
  }
}
