package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Tables
import graft.queries.PipelineOps
import graft.similarity.{Pq, Similarity}

/** Product-quantization invariants: codebook shape/determinism, code
  * range, and the refine guarantee — with every cell probed and the
  * whole candidate set reranked, IVFPQ equals the exact top-k
  * bit-for-bit (the ADC stage only ORDERS the shortlist; the rerank
  * rescores it from raw vectors).
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val d = SparkTestSession.sfDir

  private lazy val cb = PipelineOps.pqCodebook(spark, d)
  private lazy val encoded = PipelineOps.pqEncoded(spark, d)

  test("codebook: m x ksub x subDim, seeded deterministic") {
    assert(cb.m == 8 && cb.subDim == 8)
    assert(cb.centroids.length == 8)
    assert(cb.centroids.forall(_.length == 16))
    assert(cb.centroids.forall(_.forall(_.length == 8)))
    val again = Pq.buildCodebook(Tables.embeddings(spark, d), "vec_id",
      "embedding", m = 8, ksub = 16, dim = 64, iters = 5, seed = 42L)
    assert(cb.centroids.flatten.flatten.toSeq == again.centroids.flatten.flatten.toSeq)
  }

  test("encode: one code row per vector, m codes each, all in [0, ksub)") {
    val n = Tables.embeddings(spark, d).count()
    assert(encoded.count() == n)
    val bad = encoded.filter(
      size(col("codes")) =!= 8 ||
        exists(col("codes"), c => c < 0 || c >= 16)).count()
    assert(bad == 0)
  }

  test("encode fails loudly on duplicate vec_ids (a corrupted code array, not garbage scores)") {
    import spark.implicits._
    val dup = Seq(
      (1L, Array.fill(64)(1.0f)),
      (1L, Array.fill(64)(2.0f)), // same id, different vector
      (2L, Array.fill(64)(3.0f))
    ).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Pq.encode(dup, "vec_id", "embedding", cb).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("PQ encode requires unique ids")),
      s"expected the loud unique-id error, got: ${ex.getMessage}")
  }

  test("codebook save/load round-trips; a truncated write fails loudly") {
    val path = java.nio.file.Files.createTempDirectory("graft-pq-cb").toString
    Pq.saveCodebook(spark, cb, s"$path/cb")
    val loaded = Pq.loadCodebook(spark, s"$path/cb")
    assert(loaded.m == cb.m && loaded.subDim == cb.subDim)
    assert(loaded.centroids.flatten.flatten.toSeq == cb.centroids.flatten.flatten.toSeq)
    // the loaded codebook encodes identically
    val a = Pq.encode(Tables.embeddings(spark, d), "vec_id", "embedding", loaded)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = encoded.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a == b)
    // drop one subspace: the load must refuse
    import org.apache.spark.sql.functions.col
    spark.read.parquet(s"$path/cb").filter(col("subspace") =!= 0)
      .write.parquet(s"$path/trunc")
    val ex = intercept[IllegalArgumentException](Pq.loadCodebook(spark, s"$path/trunc"))
    assert(ex.getMessage.contains("non-contiguous subspaces"))
  }

  test("ivfPqTopK with full probe + full shortlist equals the exact top-k") {
    val idx = PipelineOps.persistedIvfIndex(spark, d)
    val queries = Tables.embeddings(spark, d)
      .filter(pmod(col("vec_id"), lit(100)) === 0)
    val corpusN = Tables.embeddings(spark, d).count().toInt
    val full = Pq.ivfPqTopK(idx, encoded, cb, queries, "vec_id", "embedding",
      k = 5, nprobe = idx.centroids.length, shortlist = corpusN)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val exact = Similarity.queryIvf(idx, queries, "vec_id", "embedding",
      k = 5, nprobe = idx.centroids.length)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(full == exact)
  }

  test("cell members absent from the encoded table still surface via the exact rerank") {
    // vectors appended to the IVF index without a re-encode have no code
    // row: they must route into the exact rerank, not silently drop —
    // with half the codes missing, full probe + full shortlist must STILL
    // equal the exact top-k
    val idx = PipelineOps.persistedIvfIndex(spark, d)
    val queries = Tables.embeddings(spark, d)
      .filter(pmod(col("vec_id"), lit(100)) === 0)
    val corpusN = Tables.embeddings(spark, d).count().toInt
    val halfEncoded = encoded.filter(pmod(col("vec_id"), lit(2)) === 0)
    val full = Pq.ivfPqTopK(idx, halfEncoded, cb, queries, "vec_id", "embedding",
      k = 5, nprobe = idx.centroids.length, shortlist = corpusN)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val exact = Similarity.queryIvf(idx, queries, "vec_id", "embedding",
      k = 5, nprobe = idx.centroids.length)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(full == exact,
      "unencoded cell members must reach the rerank (cells ⊄ encoded)")
  }

  test("OPQ rotation is orthonormal and preserves inner products (rotation invariance)") {
    val model = PipelineOps.opqModel(spark, d)
    val r = model.rotation
    assert(r.length == 64 && r.forall(_.length == 64))
    // R·Rᵀ == I: rows are unit length and mutually orthogonal
    for (i <- r.indices; j <- i until r.length) {
      val dot = r(i).zip(r(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"R·Rᵀ[$i][$j] = $dot")
    }
    // ⟨Rx, Ry⟩ == ⟨x, y⟩ on arbitrary vectors (what makes rotated-space
    // ADC approximate the SAME cosine the unrotated path does)
    val x = Array.tabulate(64)(i => math.sin(i + 1.0))
    val y = Array.tabulate(64)(i => math.cos(2.0 * i - 3.0))
    def rot(v: Array[Double]) = r.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
    val raw = x.zip(y).map { case (a, b) => a * b }.sum
    val rotated = rot(x).zip(rot(y)).map { case (a, b) => a * b }.sum
    assert(math.abs(raw - rotated) < 1e-9)
  }

  test("OPQ allocation balances per-subspace variance at least as well as contiguous PCA order") {
    // the greedy Σ log λ allocation must never be WORSE-balanced than
    // just cutting the descending-λ eigenbasis into contiguous slices
    // (what naive PCA-then-PQ does)
    val emb = Tables.embeddings(spark, d)
    val nrm = Similarity.norm(col("embedding"))
    val pca = graft.cluster.Pca.fit(
      emb.filter(nrm > 0)
        .select(graft.functions.VectorExprs.scale(col("embedding"), nrm).as("v")),
      "v", 64)
    val logs = pca.variance.map(v => math.log(math.max(v, 1e-12)))
    def spread(sums: Seq[Double]) = sums.max - sums.min
    val contiguous = logs.grouped(8).map(_.sum).toSeq
    // recover the greedy's buckets by re-running its allocation rule
    val bucketSum = Array.fill(8)(0.0)
    val bucketN = Array.fill(8)(0)
    for (j <- 0 until 64) {
      val b = (0 until 8).filter(bucketN(_) < 8).minBy(i => (bucketSum(i), i))
      bucketSum(b) += logs(j); bucketN(b) += 1
    }
    assert(spread(bucketSum.toSeq) <= spread(contiguous) + 1e-9,
      s"greedy ${spread(bucketSum.toSeq)} vs contiguous ${spread(contiguous)}")
  }

  test("ivfOpqTopK with full probe + full shortlist equals the exact top-k") {
    val idx = PipelineOps.persistedIvfIndex(spark, d)
    val model = PipelineOps.opqModel(spark, d)
    val queries = Tables.embeddings(spark, d)
      .filter(pmod(col("vec_id"), lit(100)) === 0)
    val corpusN = Tables.embeddings(spark, d).count().toInt
    val full = graft.similarity.Opq.ivfOpqTopK(idx,
      PipelineOps.opqEncoded(spark, d), model, queries, "vec_id", "embedding",
      k = 5, nprobe = idx.centroids.length, shortlist = corpusN)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val exact = Similarity.queryIvf(idx, queries, "vec_id", "embedding",
      k = 5, nprobe = idx.centroids.length)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(full == exact)
  }

  test("OPQ model save/load round-trips; a corrupted rotation fails loudly") {
    val model = PipelineOps.opqModel(spark, d)
    val path = java.nio.file.Files.createTempDirectory("graft-opq-model").toString
    graft.similarity.Opq.save(spark, model, s"$path/m")
    val loaded = graft.similarity.Opq.load(spark, s"$path/m")
    assert(loaded.rotation.map(_.toSeq).toSeq == model.rotation.map(_.toSeq).toSeq)
    assert(loaded.cb.centroids.flatten.flatten.toSeq ==
      model.cb.centroids.flatten.flatten.toSeq)
    // corruption detection: a row-scaled (non-orthonormal) rotation refuses
    import spark.implicits._
    val bad = model.rotation.zipWithIndex
      .map { case (r, i) => (i, r.map(_ * (if (i == 0) 2.0 else 1.0)).toSeq) }
      .toSeq.toDF("row", "coeffs")
    bad.coalesce(1).write.mode("overwrite").parquet(s"$path/m/rotation")
    val ex = intercept[IllegalArgumentException] {
      graft.similarity.Opq.load(spark, s"$path/m")
    }
    assert(ex.getMessage.contains("not orthonormal"))
  }

  test("on a variance-skewed corpus, OPQ's ADC shortlist recall beats plain PQ's") {
    import spark.implicits._
    // anisotropic synthetic corpus: coordinate i scaled by 1/(1+i)
    // (energy concentrated in the low dims — the regime contiguous PQ
    // slices handle worst, since subspace 0 carries most of the signal)
    def vec(id: Long): Array[Float] = {
      var h = id * 2654435761L + 12345L
      Array.tabulate(64) { i =>
        h = h * 6364136223846793005L + 1442695040888963407L
        val u = ((h >>> 33).toDouble / (1L << 31).toDouble) - 0.5
        (u / (1.0 + i)).toFloat
      }
    }
    val corpus = (0L until 400L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val queries = (0L until 400L by 40L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val idx = Similarity.buildIvfIndex(corpus, "vec_id", "embedding", nlist = 4, seed = 7L)
    val exact = Similarity.queryIvf(idx, queries, "vec_id", "embedding",
      k = 5, nprobe = 4).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(res: org.apache.spark.sql.DataFrame): Int =
      res.select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).count(exact)
    val pqCb = Pq.buildCodebook(corpus, "vec_id", "embedding",
      m = 8, ksub = 16, dim = 64, iters = 5, seed = 7L)
    val pqRecall = recallOf(Pq.ivfPqTopK(idx,
      Pq.encode(corpus, "vec_id", "embedding", pqCb), pqCb, queries,
      "vec_id", "embedding", k = 5, nprobe = 4, shortlist = 8))
    val opq = graft.similarity.Opq.train(corpus, "vec_id", "embedding",
      m = 8, ksub = 16, dim = 64, iters = 5, seed = 7L)
    val opqRecall = recallOf(graft.similarity.Opq.ivfOpqTopK(idx,
      graft.similarity.Opq.encode(corpus, "vec_id", "embedding", opq), opq,
      queries, "vec_id", "embedding", k = 5, nprobe = 4, shortlist = 8))
    assert(opqRecall >= pqRecall,
      s"OPQ recall $opqRecall must be >= plain PQ $pqRecall on the skewed corpus")
  }

  test("operating-point result is complete: full top-5, ranks 1..5 per query") {
    val idx = PipelineOps.persistedIvfIndex(spark, d)
    val queries = Tables.embeddings(spark, d)
      .filter(pmod(col("vec_id"), lit(100)) === 0)
    val res = Pq.ivfPqTopK(idx, encoded, cb, queries, "vec_id", "embedding",
      k = 5, nprobe = 6, shortlist = 50)
    // every query returns a full k and ranks are 1..k, distinct
    val perQuery = res.groupBy("query_id")
      .agg(count(lit(1)).as("n"), countDistinct("rank").as("nr"),
        min("rank").as("lo"), max("rank").as("hi"))
      .collect()
    assert(perQuery.nonEmpty)
    perQuery.foreach { r =>
      assert(r.getLong(1) == 5L && r.getLong(2) == 5L
        && r.getInt(3) == 1 && r.getInt(4) == 5, r.toString)
    }
  }
}
