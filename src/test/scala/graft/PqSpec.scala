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
