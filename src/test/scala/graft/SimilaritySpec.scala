package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.similarity.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(2.0f, 0.0f, 0.0f)),   // same direction as 1
    (3L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal to 1
    (4L, Array(1.0f, 0.1f, 0.0f))    // near 1
  ).toDF("vec_id", "embedding")

  test("cosine: colinear = 1, orthogonal = 0") {
    val df = vecs.as("a").crossJoin(vecs.as("b"))
      .select($"a.vec_id".as("ida"), $"b.vec_id".as("idb"),
        Similarity.cosine($"a.embedding", $"b.embedding").as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(df((1L, 2L)) - 1.0) < 1e-12)
    assert(math.abs(df((1L, 3L))) < 1e-12)
    assert(df((1L, 4L)) > 0.99 && df((1L, 4L)) < 1.0)
  }

  test("referenceSimilarity reproduces the reference's pseudo-cosine (sum of norms)") {
    val r = vecs.filter($"vec_id" === 1L).crossJoin(vecs.filter($"vec_id" === 2L).select($"embedding".as("e2")))
      .select(Similarity.referenceSimilarity($"embedding", $"e2").as("s"))
      .collect().head.getDouble(0)
    // dot = 2, norms 1 + 2 -> 2/3 (true cosine would be 1.0)
    assert(math.abs(r - 2.0 / 3.0) < 1e-12)
  }

  test("brute-force top-k ranks by cosine, excludes self, deterministic ties") {
    val got = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 1L),
      "vec_id", "embedding", 3).collect()
      .map(r => (r.getInt(3), r.getLong(1))).sorted
    // rank1: id 2 (cos 1.0); rank2: id 4 (~0.995); rank3: id 3 (0.0)
    assert(got.toSeq == Seq((1, 2L), (2, 4L), (3, 3L)))
  }

  test("near-dup pairs above threshold only, id_a < id_b") {
    val pairs = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("SRP LSH finds colinear pairs and never exceeds brute force") {
    val brute = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.srpNearDupPairs(vecs, "vec_id", "embedding", 0.99,
      numPlanes = 4, dim = 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.subsetOf(brute))
    assert(approx.contains((1L, 2L))) // identical direction always same bucket
  }

  test("IVF top-k: exact at nprobe == nlist, decent recall at nprobe < nlist") {
    val spark0 = spark
    val emb = spark0.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val queries = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val brute = pairs(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5))
    val exactIvf = pairs(Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, nlist = 8, nprobe = 8))
    assert(exactIvf == brute, "nprobe == nlist must equal brute force")

    // random embeddings spread true neighbors across cells, so expected
    // recall scales with the probed fraction; at half the cells expect
    // comfortably above half the neighbors
    val approx = pairs(Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, nlist = 8, nprobe = 4))
    assert(approx.nonEmpty)
    val recall = (approx intersect brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }

  test("KNN graph: full probe equals brute force over every point; agrees with queryIvf per nprobe") {
    val emb = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val idx = Similarity.buildIvfIndex(emb, "vec_id", "embedding", nlist = 8, seed = 42L)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet

    // every point is a query: at nprobe == nlist the graph is brute force
    val exact = rows(Similarity.knnGraph(idx, emb, "vec_id", "embedding", k = 5, nprobe = 8))
    val brute = rows(Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 5))
    assert(exact == brute, "full-probe KNN graph must equal brute force")

    // the shuffle-join graph and the broadcast query-set path see the same
    // candidates and rank identically at any nprobe
    val g = rows(Similarity.knnGraph(idx, emb, "vec_id", "embedding", k = 5, nprobe = 3))
    val q = rows(Similarity.queryIvf(idx, emb, "vec_id", "embedding", k = 5, nprobe = 3))
    assert(g == q, "knnGraph and queryIvf must agree at the same probe depth")
  }

  test("cross-corpus ANN join: full probe equals brute force A-vs-B; same-id pairs surface") {
    val emb = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val a = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    val b = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val idx = Similarity.buildIvfIndex(b, "vec_id", "embedding", nlist = 8, seed = 42L)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val joined = rows(Similarity.annJoin(idx, a, "vec_id", "embedding", k = 4, nprobe = 8))
    // brute force A-vs-B: bruteForceTopK excludes equal ids (self-match
    // semantics), but A and B are disjoint here so none exist to drop
    val brute = rows(Similarity.bruteForceTopK(b, a, "vec_id", "embedding", 4))
    assert(joined == brute, "full-probe cross-corpus join must equal brute force")
    // A≠B means an id shared across corpora is a legitimate neighbor:
    // probe B with a B member's own vector under a fresh A-side id space
    import spark.implicits._
    val probe = b.limit(1).select(col("vec_id"), col("embedding")).collect().head
    val aAliased = Seq((probe.getLong(0), probe.getSeq[Float](1).toArray))
      .toDF("vec_id", "embedding")
    val hit = Similarity.annJoin(idx, aAliased, "vec_id", "embedding", k = 1, nprobe = 8)
      .collect().head
    assert(hit.getLong(1) == probe.getLong(0) && math.abs(hit.getDouble(2) - 1.0) < 1e-6,
      "a same-id cross-corpus twin must surface as its own top-1, not be self-filtered")
  }

  test("persisted IVF index: write/read round-trip equals one-shot, scan prunes by cell") {
    val emb = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val queries = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
    val path = "target/test-ivf-index"

    val built = Similarity.buildIvfIndex(emb, "vec_id", "embedding", nlist = 8, seed = 42L)
    Similarity.writeIvfIndex(built, path)
    val loaded = Similarity.readIvfIndex(spark, path)
    assert(loaded.centroids.map(_._1).toSeq == (0 until 8),
      "centroid sidecar must round-trip all cells in order")

    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val oneShot = rows(Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, nlist = 8, nprobe = 3))
    val served = rows(Similarity.queryIvf(loaded, queries, "vec_id", "embedding",
      k = 5, nprobe = 3))
    assert(served == oneShot, "persisted index must serve identical results")

    // the partitioned layout must let a cell filter prune the scan
    val plan = loaded.cells.filter(col("cell") === 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"expected partition pruning on cell in:\n$plan")
  }

  test("index append absorbs new vectors without refit; full probe stays exact") {
    val emb = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val half = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val rest = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    val queries = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
    val path = "target/test-ivf-append"

    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(half, "vec_id", "embedding", nlist = 8, seed = 42L),
      path)
    Similarity.appendToIvfIndex(spark, path, rest, "vec_id", "embedding")
    val grown = Similarity.readIvfIndex(spark, path)
    assert(grown.cells.count() == emb.count(),
      "every appended vector must land in exactly one cell")

    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    // at nprobe == nlist the grown index is EXACT over the FULL corpus —
    // the frozen quantizer affects recall at partial probes, never the
    // full-probe result
    val exact = rows(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5))
    val viaGrown = rows(Similarity.queryIvf(grown, queries, "vec_id", "embedding",
      k = 5, nprobe = 8))
    assert(viaGrown == exact, "appended index must serve the exact full-probe result")
  }

  test("build drops zero-norm vectors; append assigns duplicate-id rows per ROW") {
    import spark.implicits._
    // 2-D toy corpus with two well-separated clusters + a zero vector
    val base = Seq(
      (1L, Array(10.0f, 0.0f)), (2L, Array(11.0f, 0.5f)),
      (3L, Array(0.0f, 10.0f)), (4L, Array(0.5f, 11.0f)),
      (5L, Array(0.0f, 0.0f)) // zero norm: no direction, must be dropped
    ).toDF("vec_id", "embedding")
    val idx = Similarity.buildIvfIndex(base, "vec_id", "embedding",
      nlist = 2, seed = 42L)
    assert(idx.cells.count() == 4L, "the zero vector must not enter the index")
    assert(idx.centroids.forall(_._2.forall(v => !v.isNaN)),
      "a zero vector must never poison the centroids with NaN")

    // duplicate-id append: id 7 carries TWO vectors whose nearest cells
    // differ — each ROW must land in its own nearest cell (an id-keyed
    // argmin would collapse them into one)
    val path = "target/test-ivf-dupid"
    Similarity.writeIvfIndex(idx, path)
    val dup = Seq(
      (7L, Array(10.5f, 0.2f)), // x-cluster
      (7L, Array(0.2f, 10.5f))  // y-cluster
    ).toDF("vec_id", "embedding")
    Similarity.appendToIvfIndex(spark, path, dup, "vec_id", "embedding")
    val grown = Similarity.readIvfIndex(spark, path)
    val cellsOf7 = grown.cells.filter(col("neighbor_id") === 7L)
      .select("cell").collect().map(_.getInt(0)).sorted.toSeq
    assert(cellsOf7.length == 2, "both duplicate-id rows must be appended")
    assert(cellsOf7.distinct.length == 2,
      s"duplicate-id rows must each reach their OWN nearest cell, got $cellsOf7")
  }

  test("cell compaction merges append fragments; results and metadata unchanged") {
    val emb = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val half = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val rest = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    val queries = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
    val path = "target/test-ivf-compact"
    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(half, "vec_id", "embedding", nlist = 8, seed = 42L),
      path)
    Similarity.appendToIvfIndex(spark, path, rest, "vec_id", "embedding")

    def parquetFiles(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$path/cells"))
        .count(_.getName.endsWith(".parquet"))
    }
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet

    val filesBefore = parquetFiles()
    val before = rows(Similarity.queryIvf(Similarity.readIvfIndex(spark, path),
      queries, "vec_id", "embedding", k = 5, nprobe = 8))
    Similarity.compactIvfCells(spark, path)
    val filesAfter = parquetFiles()
    assert(filesAfter < filesBefore,
      s"compaction must shrink the file count ($filesBefore -> $filesAfter)")
    val grown = Similarity.readIvfIndex(spark, path) // sidecar still asserts
    assert(rows(Similarity.queryIvf(grown, queries, "vec_id", "embedding",
      k = 5, nprobe = 8)) == before, "compaction must not change any result")
  }

  test("drift metric: ~1 when fresh, rises on out-of-distribution appends, refit restores it and recall") {
    // three tight blobs on the unit sphere: the index is built on A1/A2
    // only; B sits between them (45 deg to each) with jitter along x, so
    // appended B members SPLIT across the two frozen cells
    def blob(center: Array[Double], n: Int, jitterAxis: Int, idBase: Long) =
      (0 until n).map { i =>
        val v = center.clone()
        v(jitterAxis) += 0.03 * ((i % 7) - 3)
        (idBase + i, v.map(_.toFloat))
      }
    val a = (blob(Array(1, 0, 0, 0), 30, 2, 0L) ++
      blob(Array(0, 1, 0, 0), 30, 2, 100L)).toDF("vec_id", "embedding")
    val b = blob(Array(0.7071, 0.7071, 0, 0), 20, 0, 200L)
      .toDF("vec_id", "embedding")
    val path = "target/test-ivf-drift"

    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(a, "vec_id", "embedding", nlist = 2, seed = 42L), path)
    val fresh = Similarity.ivfDrift(spark, path)
    assert(math.abs(fresh.ratio - 1.0) < 1e-6,
      s"a freshly built index must self-report no drift, got $fresh")

    Similarity.appendToIvfIndex(spark, path, b, "vec_id", "embedding")
    val drifted = Similarity.ivfDrift(spark, path)
    assert(drifted.ratio > 5.0,
      s"45-degree out-of-distribution appends must move the ratio, got $drifted")

    // recall at nprobe=1 for B queries: true neighbors are other B
    // members, split across the two frozen cells -> probe misses some
    val all = a.unionAll(b)
    val queries = b.filter(pmod(col("vec_id"), lit(5)) === 0)
    def recall(idx: Similarity.IvfIndex, nprobe: Int): Double = {
      val exact = Similarity.bruteForceTopK(all, queries, "vec_id", "embedding", 5)
        .select("query_id", "neighbor_id")
      val got = Similarity.queryIvf(idx, queries, "vec_id", "embedding", 5, nprobe)
        .select("query_id", "neighbor_id")
      got.intersect(exact).count().toDouble / exact.count()
    }
    val before = recall(Similarity.readIvfIndex(spark, path), nprobe = 1)
    assert(before < 0.95, s"the frozen quantizer should be missing neighbors, got $before")

    // refit with a cell for B: drift returns to ~1, single-probe recall
    // is whole again, and nothing was lost
    Similarity.refitIvfIndex(spark, path, nlist = Some(3), seed = 42L)
    val refit = Similarity.ivfDrift(spark, path)
    assert(math.abs(refit.ratio - 1.0) < 1e-6,
      s"a refit index must self-report no drift, got $refit")
    val idx = Similarity.readIvfIndex(spark, path)
    assert(idx.centroids.length == 3)
    assert(idx.cells.count() == all.count(), "refit must keep every vector")
    val after = recall(idx, nprobe = 1)
    assert(after == 1.0, s"refit must restore single-probe recall, got $after")
  }

  test("cell-skew telemetry: ~1 when balanced, trips the refit threshold on one-cell appends, refit rebalances") {
    // four balanced blobs on orthogonal axes; appends pile EXCLUSIVELY
    // into blob A's cell — in-distribution growth (same jitter scale as
    // the build, so scatter drift stays ~1) that is nonetheless
    // operationally skewed: the hot cell's probe cost grows toward a
    // scan. Exactly the case the scatter ratio cannot see and cellSkew
    // exists to catch.
    def blob(center: Array[Double], n: Int, idBase: Long) =
      (0 until n).map { i =>
        val v = center.clone()
        v(4) += 0.01 * ((i % 5) - 2)
        (idBase + i, v.map(_.toFloat))
      }
    def build(path: String): Unit = Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(
        (blob(Array(1, 0, 0, 0, 0), 20, 0L) ++
          blob(Array(0, 1, 0, 0, 0), 20, 100L) ++
          blob(Array(0, 0, 1, 0, 0), 20, 200L) ++
          blob(Array(0, 0, 0, 1, 0), 20, 300L)).toDF("vec_id", "embedding"),
        "vec_id", "embedding", nlist = 4, seed = 42L), path)
    val skewRefitAt = 3.0 // the maintenance threshold a deployment would set

    // ---- the telemetry GAP: growth drift cannot see -------------------
    // appends with the build blobs' own jitter pile into cell A: scatter
    // drift stays ~1 (in-distribution), yet the cell is 9x its peers —
    // probe cost and shuffle-partition size quietly concentrating
    val gap = "target/test-ivf-skew-gap"
    build(gap)
    val fresh = Similarity.ivfDrift(spark, gap)
    assert(fresh.cellSkew >= 1.0 && fresh.cellSkew < 1.5,
      s"a balanced build must report ~no skew, got $fresh")
    Similarity.appendToIvfIndex(spark, gap,
      blob(Array(1, 0, 0, 0, 0), 160, 1000L).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val skewed = Similarity.ivfDrift(spark, gap)
    assert(skewed.cellSkew > skewRefitAt,
      s"one-cell appends must trip the skew threshold, got $skewed")
    assert(skewed.maxCell == 180 && skewed.medianCell == 20.0,
      s"populations must be (180, 20, 20, 20) -> max 180 / median 20, got $skewed")
    assert(skewed.ratio < 1.5,
      s"fixture: in-distribution appends must keep scatter drift low, got $skewed")

    // ---- the maintenance response: refit with grown nlist -------------
    // four tight sub-blobs offset ±0.15 toward the y/z axes: every point
    // is within ~0.15 rad of the frozen x centroid (vs ~1.42 to any
    // other), so ALL 160 pile into cell A — skew 9 again (these appends
    // also move scatter drift, fine: both signals firing is the common
    // production case). The hot-cell response is a refit with MORE cells
    // (nlist grows with the corpus — the soak's scaling posture): the
    // quantizer gives the heavy region its 4 sub-blob centroids,
    // max/median returns under the threshold, and no vector is lost.
    val ref = "target/test-ivf-skew-refit"
    build(ref)
    Similarity.appendToIvfIndex(spark, ref,
      (blob(Array(1, 0.15, 0, 0, 0), 40, 1000L) ++
        blob(Array(1, -0.15, 0, 0, 0), 40, 1100L) ++
        blob(Array(1, 0, 0.15, 0, 0), 40, 1200L) ++
        blob(Array(1, 0, -0.15, 0, 0), 40, 1300L)).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val hot = Similarity.ivfDrift(spark, ref)
    assert(hot.cellSkew > skewRefitAt && hot.maxCell == 180,
      s"structured one-cell appends must trip the skew threshold too, got $hot")
    Similarity.refitIvfIndex(spark, ref, nlist = Some(8), seed = 42L)
    val refit = Similarity.ivfDrift(spark, ref)
    assert(refit.cellSkew < skewRefitAt,
      s"refit with grown nlist must rebalance cell populations, got $refit")
    assert(refit.maxCell < hot.maxCell,
      s"refit must shrink the hot cell, got $refit vs $hot")
    assert(Similarity.readIvfIndex(spark, ref).cells.count() == 240,
      "refit must keep every vector")
  }

  test("drift on a degenerate zero-scatter build: 1.0 while clean, +Infinity on any scatter") {
    // nlist == distinct vectors: every member sits exactly at its
    // centroid, so built_mean_dist == 0 and a plain ratio would be NaN
    val a = Seq((0L, Array(1f, 0f, 0f, 0f)), (1L, Array(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val path = "target/test-ivf-drift-degenerate"
    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(a, "vec_id", "embedding", nlist = 2, seed = 42L), path)
    val fresh = Similarity.ivfDrift(spark, path)
    assert(fresh.builtMeanDist == 0.0,
      s"fixture: 2 points in 2 cells must build with zero scatter, got $fresh")
    assert(fresh.ratio == 1.0, s"no scatter then, none now -> no drift, got $fresh")
    // any current scatter over the zero baseline is maximal drift:
    // +Infinity (totally ordered for thresholds, loud under arithmetic),
    // never a finite sentinel a caller could mistake for a real ratio
    Similarity.appendToIvfIndex(spark, path,
      Seq((2L, Array(0.7071f, 0.7071f, 0f, 0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val drifted = Similarity.ivfDrift(spark, path)
    assert(drifted.ratio.isPosInfinity,
      s"scatter over a zero baseline must report +Infinity, got $drifted")
  }

  test("refit swap recovery: a stranded validated .refitting dir rolls forward") {
    val emb = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
      .limit(200)
    val path = "target/test-ivf-refit-recover"
    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(emb, "vec_id", "embedding", nlist = 4, seed = 42L), path)
    // simulate a crash between the marker and the second rename: live
    // renamed away, validated replacement still staged
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(emb, "vec_id", "embedding", nlist = 4, seed = 7L),
      path + ".refitting")
    fs.create(new org.apache.hadoop.fs.Path(path + ".swapping"), true).close()
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + ".old")))
    // the next refit's recovery pass rolls the swap forward, then refits
    Similarity.refitIvfIndex(spark, path, seed = 42L)
    val idx = Similarity.readIvfIndex(spark, path)
    assert(idx.cells.count() == emb.count())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + ".old")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + ".swapping")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + ".refitting")))
  }

  test("radius search at full probe equals the brute-force cosine filter") {
    val emb = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val queries = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
    val idx = Similarity.buildIvfIndex(emb, "vec_id", "embedding", nlist = 8, seed = 42L)
    val got = Similarity.queryIvfRadius(idx, queries, "vec_id", "embedding",
      minSim = 0.2, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: every (query, other) cosine >= threshold
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
      Similarity.norm(col("embedding")).as("qnorm"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cvec"),
      Similarity.norm(col("embedding")).as("cnorm"))
    val expected = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Similarity.dot(col("qvec"), col("cvec")) /
        (col("qnorm") * col("cnorm")))
      .filter(col("cos") >= 0.2)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"radius mismatch: got ${got.size}, expected ${expected.size}")
    assert(expected.nonEmpty, "threshold must select something at test scale")
  }

  test("a truncated/partially-overwritten index fails loudly on read (meta sidecar)") {
    val emb = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val path = "target/test-ivf-stale"
    val built = Similarity.buildIvfIndex(emb, "vec_id", "embedding", nlist = 8, seed = 42L)
    Similarity.writeIvfIndex(built, path)
    assert(Similarity.readIvfIndex(spark, path).seed == 42L,
      "meta sidecar must round-trip the train seed")
    // simulate a stale mix: the cells dir is replaced by a SUBSET (as a
    // failed overwrite or concurrent rebuild would leave behind)
    val truncated = spark.read.parquet(s"$path/cells")
      .filter(pmod(col("neighbor_id"), lit(2)) === 0)
      .localCheckpoint(true) // sever lineage from the files being replaced
    truncated.write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
    val err = intercept[IllegalArgumentException] {
      Similarity.readIvfIndex(spark, path)
    }
    assert(err.getMessage.contains("fewer than"), err.getMessage)
  }
}
