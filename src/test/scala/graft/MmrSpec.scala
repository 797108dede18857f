package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MmrSelect, TopKBy}

/** The MMR diversified re-rank (`mmr_select` over a `top_k_by` pool) and
  * the RRF hybrid-retrieval fusion: selection-order invariants that the
  * DuckDB oracle (which replays the greedy pick-by-pick) cannot state
  * directly.
  */
class MmrSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Run mmr_select over an explicit candidate table:
    * (id, rel, vec) rows for ONE query → Seq of (id, mmr) in pick order.
    */
  private def mmr(cands: Seq[(Long, Double, Seq[Float])], k: Int,
                  lambda: Double): Seq[(Long, Double)] = {
    import spark.implicits._
    val df = cands.toDF("id", "rel", "vec")
    val picked = df
      .groupBy(lit(1).as("g"))
      .agg(TopKBy.topKBy(col("rel"), col("id"), col("vec"), 64).as("pool"))
      .select(posexplode(MmrSelect.mmrSelect(col("pool"), k, lambda)))
      .orderBy("pos")
      .collect()
    picked.map(r => (r.getStruct(1).getLong(0), r.getStruct(1).getDouble(1))).toSeq
  }

  private val e1 = Seq(1f, 0f, 0f, 0f)
  private val e2 = Seq(0f, 1f, 0f, 0f)
  private val e3 = Seq(0f, 0f, 1f, 0f)

  test("pick 1 is pure relevance; λ=1 reduces to the relevance top-k order") {
    val cands = Seq(
      (10L, 0.9, e1), (11L, 0.8, e2), (12L, 0.7, e3), (13L, 0.6, e1))
    val picks = mmr(cands, 4, 1.0)
    assert(picks.map(_._1) == Seq(10L, 11L, 12L, 13L),
      s"λ=1 must ignore diversity entirely: $picks")
    // and the reported scores are λ·rel = rel (in exact 1e-9 units)
    assert(picks.map(_._2) == Seq(0.9, 0.8, 0.7, 0.6))
  }

  test("out-of-range k and lambda fail at analysis, not mid-job") {
    val cands = Seq((10L, 0.9, e1), (11L, 0.8, e2))
    assertThrows[org.apache.spark.sql.AnalysisException](mmr(cands, -1, 0.5))
    assertThrows[org.apache.spark.sql.AnalysisException](mmr(cands, 2, -0.1))
    assertThrows[org.apache.spark.sql.AnalysisException](mmr(cands, 2, 1.5))
  }

  test("a near-duplicate of the top pick is demoted below a diverse candidate") {
    // 11 is an exact duplicate direction of 10 with almost the same
    // relevance; 12 is orthogonal with lower relevance. Pure relevance
    // would rank 10, 11, 12 — MMR at λ=0.7 must hold 11 back (its
    // max-sim to the selected 10 is 1.0, a 0.3 penalty).
    val cands = Seq((10L, 0.9, e1), (11L, 0.89, e1), (12L, 0.5, e2))
    val picks = mmr(cands, 3, 0.7)
    assert(picks.map(_._1) == Seq(10L, 12L, 11L), picks.toString)
    // 11's final score carries the full redundancy penalty:
    // 0.7·0.89 − 0.3·1.0 = 0.323
    assert(math.abs(picks.last._2 - 0.323) < 1e-9)
  }

  test("negative similarity is diversity CREDIT, not clamped to zero") {
    // 11 points opposite to 10 (cos = −1): its penalty term must be
    // 0.3·(−1) = +0.3, lifting it above the orthogonal 12 despite equal
    // relevance. A max(0, sim) implementation would tie-break to 11
    // anyway here, so pin the SCORE, not just the order.
    val minus1 = Seq(-1f, 0f, 0f, 0f)
    val cands = Seq((10L, 0.9, e1), (11L, 0.5, minus1), (12L, 0.5, e2))
    val picks = mmr(cands, 3, 0.7)
    assert(picks.map(_._1) == Seq(10L, 11L, 12L), picks.toString)
    // 0.7·0.5 − 0.3·(−1) = 0.65 exactly
    assert(picks(1)._2 == 0.65, picks.toString)
  }

  test("k past the pool size returns the whole pool; ties break by smaller id") {
    val cands = Seq((21L, 0.5, e1), (20L, 0.5, e2))
    val picks = mmr(cands, 10, 0.7)
    assert(picks.map(_._1) == Seq(20L, 21L))
    assert(picks.size == 2)
  }

  test("declared sim_mmr_rerank: selections are distinct, full-k, and start at the nearest neighbor") {
    val d = SparkTestSession.sfDir
    val out = graft.SparkEntry.queries("sim_mmr_rerank")(spark, d).collect()
    val byQuery = out.groupBy(_.getLong(0))
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (q, rows) =>
      assert(rows.length == graft.queries.PipelineOps.MmrK,
        s"query $q returned ${rows.length} picks")
      val ids = rows.map(_.getLong(2))
      assert(ids.distinct.length == ids.length, s"query $q repeated a pick")
      // rank 1 is pure relevance = the exact nearest neighbor
      val first = rows.minBy(_.getInt(1)).getLong(2)
      val exact1 = graft.similarity.Similarity.bruteForceTopK(
        spark.read.parquet(s"$d/embeddings.parquet"),
        spark.read.parquet(s"$d/embeddings.parquet")
          .filter(col("vec_id") === q),
        "vec_id", "embedding", k = 1)
        .collect().head.getAs[Long]("neighbor_id")
      assert(first == exact1,
        s"query $q: first MMR pick $first != nearest neighbor $exact1")
    }
  }

  test("declared ret_hybrid_rrf: fused list is bounded, deduplicated, and rank-consistent") {
    val out = graft.SparkEntry.queries("ret_hybrid_rrf")(
      spark, SparkTestSession.sfDir).collect()
    assert(out.length <= 10 && out.nonEmpty)
    val ids = out.map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
    out.foreach { r =>
      val lex = Option(r.get(2)).map(_.asInstanceOf[Int])
      val den = Option(r.get(3)).map(_.asInstanceOf[Int])
      assert(lex.nonEmpty || den.nonEmpty, s"doc ${r.getLong(0)} in neither arm")
      val expect = lex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        den.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getDouble(1) - expect) < 1e-6,
        s"doc ${r.getLong(0)}: rrf ${r.getDouble(1)} != $expect")
    }
    // the fused list is served best-first
    val rrfs = out.map(_.getDouble(1))
    assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b },
      s"fused list not sorted: ${rrfs.toSeq}")
  }
}
