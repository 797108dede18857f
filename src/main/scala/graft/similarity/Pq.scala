package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding search at scale.
  *
  * A 100 TB embedding corpus can't serve exact distances from raw
  * float vectors: a 768-dim float32 vector is 3 KB/row. PQ splits the
  * (L2-normalized) vector into `m` subvectors and replaces each with
  * the id of its nearest per-subspace centroid — m bytes/row at
  * ksub<=256 — and approximates the inner product of a query against
  * ANY corpus vector as the sum of m table lookups (ADC, asymmetric
  * distance computation; Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011). Combined with the IVF coarse
  * index ([[Similarity.IvfIndex]]) for candidate pruning and an exact
  * rerank of the ADC shortlist from the raw vectors, this is the
  * standard IVFPQ+refine architecture — here expressed relationally:
  * codebook training is one aggregation job per Lloyd iteration (ALL m
  * subspaces train simultaneously — never m sequential fits), encoding
  * is a broadcast join + min(struct) argmin, and ADC is an equi-join
  * against a broadcast q×m×ksub lookup table. No UDFs anywhere.
  *
  * Driver state is m×ksub×(dim/m) doubles (= `dim` doubles per code
  * row) — codebook size is independent of corpus size.
  */
object Pq {

  /** Trained codebook: `centroids(subspace)(code)` is a dim/m-dim
    * centroid in the L2-normalized space.
    */
  final case class PqCodebook(m: Int, subDim: Int,
                              centroids: Array[Array[Array[Double]]])

  private def dot(a: Column, b: Column): Column = Similarity.dot(a, b)

  /** (vec_id, subspace, svec): the L2-normalized vector cut into m
    * slices. Normalizing the FULL vector first makes the cosine the
    * plain sum of per-subspace inner products.
    */
  private def slices(corpus: DataFrame, idCol: String, vecCol: String,
                     m: Int, subDim: Int): DataFrame = {
    val nrm = Similarity.norm(col(vecCol))
    // codegen vec_scale, not transform(_ / nrm) (interpreted per element)
    val normalized = graft.functions.VectorExprs.scale(col(vecCol), nrm)
    corpus
      // a zero vector has no direction: normalizing divides by 0 and the
      // NaN slices would poison every centroid mean they're averaged into
      .filter(nrm > 0)
      .select(col(idCol).as("vec_id"),
        posexplode(array((0 until m).map(j =>
          slice(normalized, j * subDim + 1, subDim)): _*)))
      .withColumnRenamed("pos", "subspace")
      .withColumnRenamed("col", "svec")
  }

  /** Codebook rows as a small broadcastable DataFrame
    * (subspace, code, cvec, cnormsq).
    */
  private def codebookDf(spark: SparkSession, cents: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    cents.zipWithIndex.flatMap { case (subs, j) =>
      subs.zipWithIndex.map { case (c, code) =>
        (j, code, c.toSeq, c.map(x => x * x).sum)
      }
    }.toSeq.toDF("subspace", "code", "cvec", "cnormsq")
  }

  /** Nearest-code assignment: argmin over the subspace's centroids of
    * ||s-c||² = ||s||² − 2⟨s,c⟩ + ||c||² (the ||s||² term is constant
    * per row, dropped). `min(struct(dist, code))` makes ties
    * deterministic (lowest code wins).
    */
  private def assign(sl: DataFrame, cb: DataFrame): DataFrame =
    sl.join(broadcast(cb), "subspace")
      .withColumn("__dist", col("cnormsq") - lit(2.0) * dot(col("svec"), col("cvec")))
      .groupBy("vec_id", "subspace")
      .agg(min(struct(col("__dist"), col("code"))).as("__best"))
      .select(col("vec_id"), col("subspace"), col("__best.code").as("code"))

  /** Train all m codebooks with `iters` Lloyd iterations — ONE
    * aggregation job per iteration covers every subspace (the update
    * collect is m×ksub×subDim doubles: bounded driver state, like any
    * k-means model). Seeded hash init; an emptied code keeps its
    * previous centroid.
    */
  def buildCodebook(corpus: DataFrame, idCol: String, vecCol: String,
                    m: Int, ksub: Int, dim: Int, iters: Int = 5,
                    seed: Long = 42L): PqCodebook = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    val spark = corpus.sparkSession
    val sl = slices(corpus, idCol, vecCol, m, subDim).localCheckpoint(true)
    try {

    // init: per subspace, the slices of the ksub lowest-hashed vectors
    // (deterministic, spread across the corpus). Selected with the
    // bounded-heap top-k aggregate — a row_number window over m
    // partitions would sort the ENTIRE n×m slice table into m tasks,
    // the near-global-window shape this codebase forbids at scale.
    var cents: Array[Array[Array[Double]]] = sl
      .select(col("subspace"), col("vec_id"), col("svec"),
        xxhash64(col("vec_id"), lit(seed)).cast("double").as("__h"))
      .groupBy("subspace")
      .agg(graft.functions.TopKBy.topKBy(-col("__h"), col("vec_id"),
        struct(col("vec_id"), col("svec")), ksub).as("top"))
      .select(col("subspace"), posexplode(col("top"))) // element: {ord, tie, payload}
      .select(col("subspace"), col("pos").as("code"),
        col("col.payload.svec").as("svec"))
      .collect()
      .groupBy(_.getInt(0)).toArray.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1))
        .map(_.getSeq[Double](2).toArray))

    for (_ <- 0 until iters) {
      val updated = assign(sl, codebookDf(spark, cents))
        .join(sl, Seq("vec_id", "subspace"))
        .select(col("subspace"), col("code"), posexplode(col("svec")))
        .groupBy("subspace", "code", "pos")
        .agg(avg("col").as("v"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
        .map { case ((j, c), rows) =>
          (j, c) -> rows.sortBy(_.getInt(2)).map(_.getDouble(3))
        }
      cents = cents.zipWithIndex.map { case (subs, j) =>
        subs.zipWithIndex.map { case (old, c) =>
          updated.getOrElse((j, c), old)
        }
      }
    }
    PqCodebook(m, subDim, cents)
    } finally
      // the checkpointed n×m slice table is consumed: release even when
      // a Lloyd/collect job fails — a retrying service must not
      // accumulate one pinned slice table per attempt
      graft.util.Pins.release(sl)
  }

  /** Persist a trained codebook as one tiny parquet (m·ksub rows of
    * subDim doubles) — the serve-many artifact completing the
    * persistence story alongside the IVF index and the tokenizer
    * models: train once, encode/probe everywhere after.
    */
  def saveCodebook(spark: SparkSession, cb: PqCodebook, path: String): Unit = {
    import spark.implicits._
    (for {
      (subs, j) <- cb.centroids.zipWithIndex
      (c, code) <- subs.zipWithIndex
    } yield (j, code, c.toSeq)).toSeq
      .toDF("subspace", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a persisted codebook, asserting its shape: every subspace must
    * hold the same contiguous code range and every centroid the same
    * dimension — a truncated or mixed write fails loudly (the IVF
    * sidecar contract).
    */
  def loadCodebook(spark: SparkSession, path: String): PqCodebook = {
    val rows = spark.read.parquet(path).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    require(rows.nonEmpty, s"no PQ codebook at $path")
    val bySub = rows.groupBy(_._1)
    val m = bySub.size
    require(bySub.keySet == (0 until m).toSet,
      s"PQ codebook at $path: non-contiguous subspaces ${bySub.keySet}")
    val ksub = bySub.values.head.length
    val subDim = rows.head._3.length
    require(bySub.values.forall(s => s.map(_._2).sorted.toSeq == (0 until ksub)),
      s"PQ codebook at $path: ragged or non-contiguous code ranges")
    require(rows.forall(_._3.length == subDim),
      s"PQ codebook at $path: mixed centroid dimensions")
    val cents = (0 until m).toArray.map { j =>
      bySub(j).sortBy(_._2).map(_._3)
    }
    PqCodebook(m, subDim, cents)
  }

  /** Encode the corpus: (vec_id, codes array<int> of length m) — the m
    * bytes/row a 100 TB corpus actually stores. Broadcast join +
    * argmin, one shuffle on vec_id to pack the code array.
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             cb: PqCodebook): DataFrame = {
    // the codes table is a FEATURE STORE keyed by vec_id: with a
    // duplicate id, the per-(id, subspace) argmin in `assign` SILENTLY
    // blends the two vectors into one chimera encoding (each subspace's
    // winner can come from either row) — corrupted ADC scores with no
    // error. Fail loudly instead, in-plan (lazy raise_error behind a
    // per-id count window; no extra driver action — the cells table
    // tolerates duplicate ids, the PQ store by construction cannot).
    val w = Window.partitionBy(col(idCol))
    val guarded = corpus
      .withColumn("__idn", count(lit(1)).over(w))
      .withColumn("__checked_vec",
        when(col("__idn") === 1, col(vecCol))
          .otherwise(raise_error(concat(
            lit("PQ encode requires unique ids: "),
            col(idCol).cast("string"),
            lit(" appears "), col("__idn").cast("string"), lit(" times")))))
    assign(slices(guarded, idCol, "__checked_vec", cb.m, cb.subDim),
      codebookDf(corpus.sparkSession, cb.centroids))
      .groupBy("vec_id")
      // direct field extraction on the sorted struct array (codegen
      // GetArrayStructFields), not a transform(_, getField) lambda
      // (interpreted per element)
      .agg(array_sort(collect_list(struct(col("subspace"), col("code"))))
        .getField("code").as("codes"))
  }

  /** IVFPQ + refine top-k: IVF cells prune candidates (`nprobe` of
    * nlist cells, hash join on `cell`), ADC scores every candidate as
    * m lookups into the broadcast q×m×ksub table (never touching raw
    * candidate vectors), and the top-`shortlist` per query is reranked
    * EXACTLY from the raw vectors riding in the cells table. Join keys
    * everywhere — cell, vec_id, (query_id, subspace, code) — no cross
    * join at any stage.
    */
  def ivfPqTopK(index: Similarity.IvfIndex, encoded: DataFrame,
                cb: PqCodebook, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, nprobe: Int,
                shortlist: Int): DataFrame =
    ivfPqTopKCore(index, encoded, cb, queries, idCol, vecCol,
      k, nprobe, shortlist, identity)

  /** The shared probe/ADC/rerank plan, with the query vector the ADC
    * table slices mapped through `adcVec` — `identity` for plain PQ,
    * the OPQ rotation for [[Opq.ivfOpqTopK]] (whose codes live in
    * rotated space). Only the ADC arm moves: the coarse probe and the
    * exact rerank always run on the raw vectors.
    */
  private[similarity] def ivfPqTopKCore(
      index: Similarity.IvfIndex, encoded: DataFrame, cb: PqCodebook,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nprobe: Int, shortlist: Int, adcVec: Column => Column): DataFrame = {
    val spark = encoded.sparkSession
    val qRaw = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      Similarity.norm(col(vecCol)).as("qnorm"))

    // coarse probe: nprobe nearest cells per query, via the shared
    // [[Similarity.probeCells]] ranking — the assignment metric
    // qnorm·‖c‖²/2 − q·c, so probe order matches how members were
    // assigned to cells (not plain −q·c, which disagrees because
    // centroids are not unit norm)
    val probed = Similarity.probeCells(index, qRaw, nprobe)
      .select(col("query_id"), col("cell"))

    // ADC lookup table: partial inner product of each normalized query
    // slice against each codebook centroid — q×m×ksub rows, broadcast
    // rotation (when present) commutes with the normalization inside
    // `slices`: ‖Rq‖ = ‖q‖ for orthonormal R, so slicing adcVec(qvec)
    // yields exactly the slices of the rotated unit query
    val qSlices = slices(
      qRaw.select(col("query_id").as("vec_id"), adcVec(col("qvec")).as("qvec")),
      "vec_id", "qvec", cb.m, cb.subDim)
      .withColumnRenamed("vec_id", "query_id")
    val adcTable = qSlices
      .join(broadcast(codebookDf(spark, cb.centroids)), "subspace")
      .select(col("query_id"), col("subspace"), col("code"),
        dot(col("svec"), col("cvec")).as("partial"))

    // candidates -> codes -> m table lookups -> ADC score. The join with
    // `encoded` is INNER: a cell member without a code row (vectors
    // added via appendToIvfIndex before a re-encode) routes through a
    // separate anti-join branch STRAIGHT into the exact rerank — never
    // silently dropped and never competing for shortlist slots, so
    // "full probe + full shortlist == exact" holds even when `encoded`
    // lags the cells table (the branch is bounded by the append delta
    // since the last encode; a re-encode restores the pure-ADC path).
    // The split — rather than a LEFT join with an `adc_rank <= shortlist
    // || adc_sim IS NULL` filter — keeps the shortlist window's rank cut
    // a PLAIN predicate, which is what lets InferWindowGroupLimit
    // contract each partition to the top `shortlist` rows BEFORE the
    // exchange; the OR-with-isNull arm defeats that rule and turns the
    // window into a full per-query candidate sort (caught on the SQ8
    // twin of this path by the round-12 review).
    val candidates = index.cells
      .join(broadcast(probed), "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
    val encRenamed = encoded.withColumnRenamed("vec_id", "neighbor_id")
    val adcScored = candidates
      .join(encRenamed, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), posexplode(col("codes")))
      .withColumnRenamed("pos", "subspace")
      .withColumnRenamed("col", "code")
      .join(broadcast(adcTable), Seq("query_id", "subspace", "code"), "left")
      .groupBy("query_id", "neighbor_id")
      .agg(sum("partial").as("adc_sim"))
    val short = adcScored
      .withColumn("adc_rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("adc_sim"), asc("neighbor_id"))))
      .filter(col("adc_rank") <= shortlist)
      .select("query_id", "neighbor_id")
      // cell members the codes table lags: straight to the exact rerank
      .unionAll(candidates
        .join(encRenamed.select("neighbor_id"), Seq("neighbor_id"), "left_anti")
        .select("query_id", "neighbor_id"))

    // refine: exact cosine over the raw vectors, shortlist-sized work
    val reranked = short
      .join(index.cells.select("neighbor_id", "cvec", "cnorm"), "neighbor_id")
      .join(broadcast(qRaw), "query_id")
      .withColumn("cosine_sim",
        dot(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")))
    reranked
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cosine_sim"), asc("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine_sim", "rank")
  }
}
