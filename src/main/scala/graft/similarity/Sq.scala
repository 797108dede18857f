package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExprs

/** Scalar quantization (SQ8) for embedding search at scale.
  *
  * The int8 storage form: each vector keeps one per-vector scale
  * (`max |vᵢ| / 127`) and a BINARY code of rounded signed bytes —
  * 4× smaller than float32 with no codebook to train, the shape FAISS
  * calls `SQ8` and serving stacks reach for before PQ when recall
  * matters more than the last 4× of compression. Scoring is
  * asymmetric (float query × int8 corpus): the approximate inner
  * product is `scale · Σ qᵢ·byteᵢ`, one codegen loop over the raw
  * byte[] ([[graft.functions.DotI8]]) — no unpack allocation, no UDF.
  *
  * Search composes with the IVF coarse index exactly like
  * [[Pq.ivfPqTopK]]: probe `nprobe` cells, score candidates from the
  * int8 codes, cut a per-query shortlist, rerank the shortlist with
  * exact float cosine. With `nprobe == nlist` and
  * `shortlist >= corpus` the result equals [[Similarity.queryIvf]]
  * bit-exactly (the rerank recomputes the identical
  * `dot/(qnorm·cnorm)` over the raw vectors).
  *
  * Unlike PQ there is no trained state: `encode` is a pure map, so
  * append-only corpora never need a refit — re-encoding a new batch
  * is embarrassingly parallel and drift-free.
  */
object Sq {

  private def dot(a: Column, b: Column): Column = Similarity.dot(a, b)

  /** Per-vector symmetric int8 quantization: `(vec_id, sq_scale,
    * sq_code)` with `sq_scale = max(max |vᵢ|, 1e-12) / 127` and
    * `sq_code[i] = round(vᵢ / sq_scale)` packed as signed bytes.
    * Pure codegen map — `array_max`/`array_min` reductions for the
    * scale (no per-element abs lambda), [[graft.functions.Sq8Pack]]
    * for the bytes. The 1e-12 floor keeps the all-zero vector
    * encodable (scale stays finite, code is all zeros).
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String): DataFrame =
    corpus
      .select(col(idCol).as("vec_id"), col(vecCol).as("__v"),
        (greatest(
          array_max(col(vecCol)).cast("double"),
          -array_min(col(vecCol)).cast("double"),
          lit(1e-12)) / 127.0).as("sq_scale"))
      .select(col("vec_id"), col("sq_scale"),
        VectorExprs.sq8Pack(col("__v"), col("sq_scale")).as("sq_code"))

  /** IVF-SQ8 top-k: coarse probe → int8 candidate scoring → shortlist
    * → exact float rerank. Same unencoded-member contract as
    * [[Pq.ivfPqTopK]]: a cell member with no code row (vectors appended
    * via [[Similarity.appendToIvfIndex]] before a re-encode) routes
    * STRAIGHT into the exact rerank via an anti-join branch — never
    * silently dropped and never competing for shortlist slots, so
    * "full probe + full shortlist == exact" holds even when `encoded`
    * lags the cells table (the branch is bounded by the append delta
    * since the last encode).
    *
    * Plan shape: the shortlist window moves only `(query_id,
    * neighbor_id, sq_sim)` — the float vectors do NOT ride through the
    * rank exchange — and its rank cut is a PLAIN `sq_rank <= shortlist`
    * predicate precisely so InferWindowGroupLimit contracts each
    * partition to the top `shortlist` rows BEFORE the exchange (an
    * OR-with-isNull arm, the obvious single-pass way to keep unencoded
    * rows, defeats that rule and turns the window into a full per-query
    * candidate sort — the split into an inner-join scored branch and an
    * anti-join unencoded branch is what buys the contraction back, at
    * the price of a second pass over the candidate set). The rerank
    * re-joins the shortlist against the cells table (shortlist-sized,
    * k·q rows) and broadcasts the query set. At scale a deployment
    * folds the codes INTO the cells table at build time (one sort-free
    * column append) and drops the encoded join entirely; keeping
    * `encoded` separate here mirrors the PQ API so both quantizers
    * serve from one IVF index.
    */
  def ivfSq8TopK(index: Similarity.IvfIndex, encoded: DataFrame,
                 queries: DataFrame, idCol: String, vecCol: String,
                 k: Int, nprobe: Int, shortlist: Int): DataFrame = {
    val qRaw = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      Similarity.norm(col(vecCol)).as("qnorm"))
    val probed = Similarity.probeCells(index, qRaw, nprobe)
    val candidates = index.cells.join(broadcast(probed), "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
    val enc = encoded.select(col("vec_id").as("neighbor_id"),
      col("sq_scale"), col("sq_code"))

    // int8 approximate cosine per ENCODED candidate: scale·(q · code)
    // normalized by the TRUE norms (qnorm from the probe, cnorm stored
    // in the cells table) — the only approximation is the quantized dot
    val sqScored = candidates.join(enc, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (col("sq_scale") * VectorExprs.dotI8(col("qvec"), col("sq_code"))
          / (col("qnorm") * col("cnorm"))).as("sq_sim"))

    val short = sqScored
      .withColumn("sq_rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("sq_sim"), asc("neighbor_id"))))
      .filter(col("sq_rank") <= shortlist)
      .select("query_id", "neighbor_id")
      // cell members the codes table lags: straight to the exact rerank
      .unionAll(candidates
        .join(enc.select("neighbor_id"), Seq("neighbor_id"), "left_anti")
        .select("query_id", "neighbor_id"))

    // refine: exact cosine over the raw vectors, shortlist-sized work
    short
      .join(index.cells.select("neighbor_id", "cvec", "cnorm"), "neighbor_id")
      .join(broadcast(qRaw), "query_id")
      .withColumn("cosine_sim",
        dot(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cosine_sim"), asc("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine_sim", "rank")
  }
}
