package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.cluster.Pca
import graft.functions.VectorExprs

/** Optimized product quantization (OPQ) — the rotate-then-quantize
  * composition that buys PQ most of its recall at real embedding
  * dimensions (Ge et al., "Optimized Product Quantization", CVPR 2013;
  * the parametric solution).
  *
  * Plain PQ cuts the vector into m CONTIGUOUS slices, so when the
  * corpus's variance is unevenly spread across coordinates (always, for
  * learned embeddings) some subspaces carry most of the signal and
  * drown their ksub codes while others quantize noise. OPQ first
  * applies an orthonormal rotation R chosen so the subspaces carry
  * BALANCED variance, then runs ordinary PQ on Rx. The parametric
  * recipe: R's rows are the PCA eigenbasis of the corpus, permuted by
  * greedily assigning eigenvectors (descending eigenvalue) to the
  * subspace with the smallest running Σ log λ — equalizing the
  * per-subspace variance PRODUCT, the quantity the quantization-error
  * bound depends on.
  *
  * Metric discipline for the cosine stack: the rotation is applied
  * WITHOUT mean centering. A mean shift is free for L2 distances but
  * breaks inner products (⟨x−μ, y−μ⟩ ≠ ⟨x, y⟩), and this engine's ADC
  * approximates the COSINE as a sum of per-subspace inner products of
  * the L2-normalized vectors. A pure orthonormal R preserves both norms
  * and inner products (⟨Rx̂, Rq̂⟩ = ⟨x̂, q̂⟩), so rotated-space ADC
  * approximates exactly the same cosine the unrotated path does — just
  * with better-conditioned codebooks — and the PCA fit runs over the
  * normalized corpus (the space being quantized). Eigenvalues are still
  * computed about the mean: they measure per-direction spread, the
  * balance criterion, even though the rotation itself doesn't shift.
  *
  * Spark shape: the fit is [[Pca.fit]]'s single treeAggregate pass
  * (driver state dim² doubles); the rotation is a pure codegen map —
  * dim `vec_dot`s against constant-folded literal rows, zero exchanges
  * (the [[Pca.project]] machinery); training and encoding are
  * [[Pq.buildCodebook]]/[[Pq.encode]] verbatim on the rotated frame;
  * search is [[Pq.ivfPqTopK]] with only the ADC arm moved to rotated
  * space — the coarse probe and the exact rerank stay on the RAW
  * vectors in the cells table, so "full probe + full shortlist ==
  * exact" survives the rotation untouched.
  */
object Opq {

  /** The rotation (rows = rotated coordinates, orthonormal) plus the PQ
    * codebook trained in rotated space. Driver-sized: dim² + dim·ksub
    * doubles.
    */
  final case class OpqModel(rotation: Array[Array[Double]], cb: Pq.PqCodebook)

  /** The OPQ-parametric rotation: PCA eigenbasis of the L2-normalized
    * corpus, rows permuted by the balanced Σ log λ greedy so each of
    * the m subspaces (subDim consecutive output coordinates) receives
    * an (approximately) equal variance product. Eigenvalues at or below
    * the degeneracy floor contribute log(floor) — rank-deficient
    * corpora still allocate deterministically.
    */
  def fitRotation(corpus: DataFrame, idCol: String, vecCol: String,
                  dim: Int, m: Int): Array[Array[Double]] = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    val nrm = Similarity.norm(col(vecCol))
    val normalized = corpus
      .filter(nrm > 0) // zero vectors have no direction (the Pq.slices guard)
      .select(VectorExprs.scale(col(vecCol), nrm).as("__nvec"))
    val model = Pca.fit(normalized, "__nvec", dim)
    // greedy balanced allocation: components arrive in descending-λ
    // order from the eigendecomposition; each goes to the non-full
    // bucket with the smallest running Σ log λ
    val logs = model.variance.map(v => math.log(math.max(v, 1e-12)))
    val bucketSum = Array.fill(m)(0.0)
    val buckets = Array.fill(m)(List.empty[Int])
    for (j <- 0 until dim) {
      val b = (0 until m)
        .filter(buckets(_).length < subDim)
        .minBy(i => (bucketSum(i), i))
      bucketSum(b) += logs(j)
      buckets(b) = j :: buckets(b)
    }
    // row order within a bucket is immaterial (any permutation is the
    // same subspace); reverse restores ascending insertion order for
    // determinism's sake
    buckets.flatMap(_.reverse).map(model.components)
  }

  /** `Rx` as a codegen map: one `vec_dot` per output coordinate against
    * the constant-folded rotation row. No centering — see the class doc.
    */
  def rotateCol(vecCol: Column, rotation: Array[Array[Double]]): Column =
    array(rotation.map { r =>
      VectorExprs.dot(vecCol, array(r.map(lit).toIndexedSeq: _*))
    }.toIndexedSeq: _*)

  /** Fit rotation + train the PQ codebook in rotated space. */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
            m: Int, ksub: Int, dim: Int, iters: Int = 5,
            seed: Long = 42L): OpqModel = {
    val rot = fitRotation(corpus, idCol, vecCol, dim, m)
    val rotated = corpus.select(col(idCol),
      rotateCol(col(vecCol), rot).as("__rvec"))
    OpqModel(rot,
      Pq.buildCodebook(rotated, idCol, "__rvec", m, ksub, dim, iters, seed))
  }

  /** Encode the corpus in rotated space: (vec_id, codes) — identical
    * storage shape and uniqueness contract as [[Pq.encode]].
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             model: OpqModel): DataFrame =
    Pq.encode(
      corpus.select(col(idCol), rotateCol(col(vecCol), model.rotation).as("__rvec")),
      idCol, "__rvec", model.cb)

  /** Persist a trained OPQ model: the codebook via [[Pq.saveCodebook]]
    * plus the rotation as one tiny parquet (dim rows of dim doubles) —
    * train once, encode/probe everywhere after, like the IVF index and
    * the tokenizer models.
    */
  def save(spark: org.apache.spark.sql.SparkSession, model: OpqModel,
           path: String): Unit = {
    import spark.implicits._
    Pq.saveCodebook(spark, model.cb, s"$path/codebook")
    model.rotation.zipWithIndex.map { case (r, i) => (i, r.toSeq) }.toSeq
      .toDF("row", "coeffs")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/rotation")
  }

  /** Load a persisted OPQ model, asserting its shape: the rotation must
    * be square, contiguous, and match the codebook's dimension
    * (m·subDim), and its rows must be orthonormal to float tolerance —
    * a truncated, double-written, or non-orthogonal artifact fails
    * loudly instead of silently skewing every ADC score.
    */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): OpqModel = {
    val cb = Pq.loadCodebook(spark, s"$path/codebook")
    val dim = cb.m * cb.subDim
    val rows = spark.read.parquet(s"$path/rotation").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    require(rows.nonEmpty, s"no OPQ rotation at $path/rotation")
    require(rows.map(_._1).sorted.toSeq == (0 until dim),
      s"OPQ rotation at $path: rows ${rows.map(_._1).sorted.toSeq.take(5)}... " +
        s"are not the contiguous 0 until $dim (truncated or double-written)")
    val rot = rows.sortBy(_._1).map(_._2)
    require(rot.forall(_.length == dim),
      s"OPQ rotation at $path: non-square rows (dim must be $dim)")
    for (i <- rot.indices; j <- i until rot.length) {
      val d = rot(i).zip(rot(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      require(math.abs(d - want) < 1e-6,
        s"OPQ rotation at $path is not orthonormal (R·Rᵀ[$i][$j] = $d) — " +
          "corrupted artifact")
    }
    OpqModel(rot, cb)
  }

  /** IVFOPQ + refine top-k: [[Pq.ivfPqTopK]]'s exact plan with the ADC
    * lookup table built from ROTATED query slices (matching the rotated
    * codes); coarse probe and exact rerank untouched in raw space.
    */
  def ivfOpqTopK(index: Similarity.IvfIndex, encoded: DataFrame,
                 model: OpqModel, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int, nprobe: Int,
                 shortlist: Int): DataFrame =
    Pq.ivfPqTopKCore(index, encoded, model.cb, queries, idCol, vecCol,
      k, nprobe, shortlist, qvec => rotateCol(qvec, model.rotation))
}
