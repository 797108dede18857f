package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Tables
import graft.queries.PipelineOps
import graft.similarity.{Similarity, Sq}

/** Scalar-quantization (SQ8) invariants: the encode's per-element error
  * bound (|v − scale·byte| <= scale/2 — the defining property of
  * round-to-nearest int8), the refine guarantee (full probe + full
  * shortlist equals the exact top-k bit-for-bit — int8 scoring only
  * ORDERS the shortlist, the rerank rescores raw vectors), and the
  * null-routing contract for cell members the encoded table lags.
  */
class SqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val d = SparkTestSession.sfDir

  private lazy val encoded = PipelineOps.sq8Encoded(spark, d)

  test("encode: one row per vector, dim-length code, scale/2 error bound") {
    val emb = Tables.embeddings(spark, d)
    val n = emb.count()
    assert(encoded.count() == n)
    // reconstruct v̂ᵢ = scale·byteᵢ and check max |vᵢ − v̂ᵢ| <= scale/2
    // (+ tiny epsilon for the float→double read): round-to-nearest
    // within the clamp range, which max|v|/127 scaling guarantees.
    // BINARY has no SQL lambda access, so the check runs driver-side
    // over the collected test corpus (small by construction).
    val rows = emb.join(encoded, "vec_id")
      .select(col("embedding"), col("sq_scale"), col("sq_code"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      val s = r.getDouble(1)
      val code = r.getAs[Array[Byte]](2)
      assert(code.length == v.length, s"code length ${code.length} != dim ${v.length}")
      v.indices.foreach { i =>
        val err = math.abs(v(i).toDouble - s * code(i))
        assert(err <= s * 0.5 + 1e-9, s"elem $i err $err > scale/2 ${s * 0.5}")
      }
    }
  }

  test("encode: the all-zero vector survives (scale floored, code all zeros)") {
    import spark.implicits._
    val z = Seq((1L, Array.fill(8)(0.0f))).toDF("vec_id", "embedding")
    val row = Sq.encode(z, "vec_id", "embedding").collect().head
    assert(row.getDouble(1) > 0.0) // finite, floored scale
    assert(row.getAs[Array[Byte]](2).forall(_ == 0))
  }

  test("ivfSq8TopK with full probe + full shortlist equals the exact top-k") {
    val idx = PipelineOps.persistedIvfIndex(spark, d)
    val queries = Tables.embeddings(spark, d)
      .filter(pmod(col("vec_id"), lit(100)) === 0)
    val corpusN = Tables.embeddings(spark, d).count().toInt
    val full = Sq.ivfSq8TopK(idx, encoded, queries, "vec_id", "embedding",
      k = 5, nprobe = idx.centroids.length, shortlist = corpusN)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val exact = Similarity.queryIvf(idx, queries, "vec_id", "embedding",
      k = 5, nprobe = idx.centroids.length)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(full == exact)
  }

  test("cell members absent from the encoded table still surface via the exact rerank") {
    val idx = PipelineOps.persistedIvfIndex(spark, d)
    val queries = Tables.embeddings(spark, d)
      .filter(pmod(col("vec_id"), lit(100)) === 0)
    val corpusN = Tables.embeddings(spark, d).count().toInt
    val halfEncoded = encoded.filter(pmod(col("vec_id"), lit(2)) === 0)
    val full = Sq.ivfSq8TopK(idx, halfEncoded, queries, "vec_id", "embedding",
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
    val res = Sq.ivfSq8TopK(idx, encoded, queries, "vec_id", "embedding",
      k = 5, nprobe = 6, shortlist = 50)
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

  test("sq8_pack clamps a too-tight caller scale instead of overflowing") {
    import spark.implicits._
    val v = Seq((1L, Array(10.0f, -10.0f, 0.5f))).toDF("vec_id", "embedding")
    // scale chosen so 10.0/scale = 200 > 127: must saturate at ±127
    val code = v.select(graft.functions.VectorExprs.sq8Pack(
      col("embedding"), lit(0.05)).as("c")).collect().head.getAs[Array[Byte]](0)
    assert(code(0) == 127 && code(1) == -127 && code(2) == 10)
  }
}
