package graft.streaming

import java.nio.file.{Files, Path => JPath}
import java.util.Comparator
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.similarity.Similarity

/** Exhaustive crash-point fuzz of [[IncrementalAnnIndex]]'s marker
  * protocol (round-18 item: the bootstrap/append/refit swap was the
  * last store certified by hand-enumerated crash windows after round 17
  * exhausted the 8 BatchStore stores). Same method as [[CrashFuzzSpec]]:
  * dry-run each mutating phase through [[CrashFs]] to count its fs
  * mutations, then for every k crash at op k, run the RESTART sequence
  * the streaming runner would ([[Similarity.recoverIvfMaintenance]] +
  * batch replay + the restart-time refit check), and assert the index
  * invariant:
  *
  *  - every ingested vector indexed EXACTLY once (no replay
  *    double-append, no crash loss), and
  *  - '''full-probe exactness''': nprobe = nlist search returns the
  *    brute-force cosine top-1 for every member query — the invariant
  *    that holds regardless of how a refit re-clustered the cells.
  *
  * The encoder sidecar rides along (Sq8), so the sweep also crashes the
  * inline-encode renames and asserts the sidecar converges to one code
  * per cells row (the cells/sidecar atomic-commit contract).
  */
class AnnCrashFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def copyTree(src: JPath, dst: JPath): Unit = {
    Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t) }
    }
  }

  private def deleteTree(p: JPath): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[JPath]())
        .forEach(f => Files.delete(f))

  // two tight axis blobs (the build distribution) + one 45-degree blob
  // (the OOD append that breaches the drift ratio) — the SimilaritySpec
  // drift fixture, shrunk for the sweep's many iterations
  private def blob(center: Array[Double], n: Int, idBase: Long) =
    (0 until n).map { i =>
      val v = center.clone()
      v(2) += 0.03 * ((i % 7) - 3)
      (idBase + i, v.map(_.toFloat))
    }
  private val batch0 = blob(Array(1, 0, 0, 0), 12, 0L) ++
    blob(Array(0, 1, 0, 0), 12, 100L)
  private val batch1 = blob(Array(0.7071, 0.7071, 0, 0), 8, 200L)

  private val enc: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
    df => graft.similarity.Sq.encode(df, "vec_id", "vec")

  private def process(dir: String, rows: Seq[(Long, Array[Float])], id: Long,
                      refitAt: Double = 0.0): Unit =
    IncrementalAnnIndex.processBatch(rows.toDF("vec_id", "embedding"), id,
      "vec_id", "embedding", dir, nlist = 2, refitAt = refitAt,
      driftCheckEvery = 0, seed = 42L, encoder = Some(enc))

  /** The restart sequence [[IncrementalAnnIndex.run]] performs, minus
    * the stream plumbing: recover stranded maintenance, replay the
    * in-flight batch, re-check fit (the restart-time refit window).
    */
  private def restart(dir: String, rows: Seq[(Long, Array[Float])], id: Long,
                      refitAt: Double): Unit = {
    Similarity.recoverIvfMaintenance(spark, dir)
    CompactionSwap.recoverDanglingOld(
      CompactionSwap.fsFor(dir, hconf), IncrementalAnnIndex.encodedDir(dir))
    process(dir, rows, id, refitAt)
    if (refitAt > 0)
      IncrementalAnnIndex.maintainFit(spark, dir, refitAt,
        skewRefitAt = 0.0, seed = 42L)
  }

  /** Invariant: every ingested id indexed exactly once, sidecar has one
    * code per cells row, and full-probe top-1 equals brute-force cosine
    * top-1 for every ingested vector (self excluded).
    */
  private def assertExact(dir: String,
                          ingested: Seq[(Long, Array[Float])]): Unit = {
    val index = Similarity.readIvfIndex(spark, dir)
    val ids = index.cells.select("neighbor_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.sorted == ingested.map(_._1).sorted,
      s"cells must hold every ingested id exactly once")
    val codes = IncrementalAnnIndex.readEncoded(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(codes.sorted == ingested.map(_._1).sorted,
      "sidecar must hold exactly one code per cells row")
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val queries = ingested.take(3) ++ ingested.takeRight(3)
    val got = Similarity.queryIvf(index,
      queries.toDF("vec_id", "embedding"), "vec_id", "embedding",
      k = 1, nprobe = index.centroids.length)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    queries.foreach { case (qid, qv) =>
      val expect = ingested.filter(_._1 != qid)
        .map { case (nid, nv) => (nid, cos(qv, nv)) }
        .minBy { case (nid, s) => (-s, nid) }._1
      assert(got(qid) == expect,
        s"full-probe top-1 for $qid must be brute-force exact: " +
          s"got ${got(qid)}, expected $expect")
    }
  }

  /** One exhaustive sweep: `mutate` runs against a crash-armed twin of
    * the template at every possible crash op; `heal` then runs against
    * the plain path and the invariant is asserted.
    */
  private def sweep(tag: String, template: JPath,
                    mutate: String => Unit, heal: String => Unit,
                    ingested: Seq[(Long, Array[Float])]): Unit = {
    hconf.set("fs.crash.impl", classOf[CrashFs].getName)
    val probe = Files.createTempDirectory(s"graft-annfuzz-$tag-probe")
    deleteTree(probe); copyTree(template, probe)
    CrashFs.armCounting()
    mutate(s"crash://$probe/index")
    val n = CrashFs.opCount
    assert(n > 0, s"$tag: the dry run must traverse the injector")
    info(s"$tag: $n mutating ops — sweeping all")
    (0L until n).foreach { k =>
      val work = Files.createTempDirectory(s"graft-annfuzz-$tag-$k")
      deleteTree(work); copyTree(template, work)
      CrashFs.armCrashAfter(k)
      try mutate(s"crash://$work/index")
      catch { case _: Throwable => () } // the injected crash
      finally CrashFs.disarm()
      heal(s"$work/index")
      try assertExact(s"$work/index", ingested)
      catch {
        case e: org.scalatest.exceptions.TestFailedException =>
          fail(s"$tag: invariant broken after crash at mutating op $k: ${e.getMessage}")
      }
      deleteTree(work)
    }
    deleteTree(probe)
  }

  test("bootstrap survives a crash at EVERY mutating fs operation") {
    val template = Files.createTempDirectory("graft-annfuzz-boot")
    // empty template: the sweep crashes the very first batch
    sweep("bootstrap", template,
      mutate = dir => process(dir, batch0, 0L),
      heal = dir => restart(dir, batch0, 0L, refitAt = 0.0),
      ingested = batch0)
  }

  test("append survives a crash at EVERY mutating fs operation") {
    val template = Files.createTempDirectory("graft-annfuzz-app")
    process(s"$template/index", batch0, 0L) // committed bootstrap
    sweep("append", template,
      mutate = dir => process(dir, batch1, 1L),
      heal = dir => restart(dir, batch1, 1L, refitAt = 0.0),
      ingested = batch0 ++ batch1)
  }

  test("drift-refit survives a crash at EVERY mutating fs operation") {
    val template = Files.createTempDirectory("graft-annfuzz-refit")
    process(s"$template/index", batch0, 0L)
    process(s"$template/index", batch1, 1L) // OOD rows: drift ratio high
    val report = Similarity.ivfDrift(spark, s"$template/index")
    assert(report.ratio > 1.05, s"fixture must breach the refit gate: $report")
    sweep("refit", template,
      mutate = dir => IncrementalAnnIndex.maintainFit(spark, dir,
        refitAt = 1.05, skewRefitAt = 0.0, seed = 42L),
      // restart replays the last batch (a no-op: marker committed) and
      // re-checks fit — the run()-restart window that heals a rolled-back
      // still-drifted index
      heal = dir => restart(dir, batch1, 1L, refitAt = 1.05),
      ingested = batch0 ++ batch1)
  }
}
