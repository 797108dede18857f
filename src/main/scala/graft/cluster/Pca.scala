package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

/** Principal component analysis, expressed Spark-first for a corpus that
  * does not fit anywhere near one machine:
  *
  *  - FIT is one distributed pass: MLlib `RowMatrix` accumulates the
  *    column means and the dim×dim Gramian via treeAggregate (map-side
  *    partial sums, no shuffle of rows), so driver state is dim² doubles
  *    — 64×64 here — independent of corpus size, the same posture as the
  *    k-means centroid state. The eigendecomposition then runs
  *    driver-side on that tiny matrix.
  *  - PROJECTION is map-side and fully codegen: `y_j = vec_dot(x, v_j) −
  *    ⟨μ, v_j⟩` with the component vectors constant-folded into the plan
  *    as literals and the mean-shift folded into one scalar per
  *    component — centering never materializes a per-row intermediate
  *    array (and needs no interpreted `zip_with` lambda). Zero exchanges
  *    after the fit.
  *
  * Sign convention: each eigenvector is flipped so its largest-magnitude
  * coordinate is positive — eigendecomposition is otherwise
  * sign-ambiguous, and the declared queries pin determinism.
  *
  * The PCA→project pipeline is the standard dimensionality-reduction
  * stage in front of clustering / ANN (OPQ-style rotations, whitening)
  * for embedding corpora.
  */
object Pca {

  /** k components (rows, sign-normalized, orthonormal), their explained
    * variance RATIOS (descending, fractions of total variance), their
    * absolute sample variances (the eigenvalues — what whitening divides
    * by), and the column mean — all driver-sized.
    */
  case class PcaModel(dim: Int, k: Int, mean: Array[Double],
                      components: Array[Array[Double]],
                      varianceRatio: Array[Double],
                      variance: Array[Double])

  def fit(emb: DataFrame, vecCol: String, k: Int): PcaModel = {
    import org.apache.spark.mllib.linalg.{Vectors => MlVectors}
    import org.apache.spark.mllib.linalg.distributed.RowMatrix
    val rows = emb.select(col(vecCol).cast("array<double>")).rdd
      .map(r => MlVectors.dense(r.getSeq[Double](0).toArray))
    val mat = new RowMatrix(rows)
    val dim = mat.numCols().toInt
    val stats = mat.computeColumnSummaryStatistics()
    val mean = stats.mean.toArray
    // total sample variance = trace of the covariance = Σ eigenvalues,
    // so λ_j recovers from the ratio without a second distributed pass
    val totalVar = stats.variance.toArray.sum
    val (pc, ratios) = mat.computePrincipalComponentsAndExplainedVariance(k)
    val comps = Array.tabulate(k) { j =>
      val c = Array.tabulate(dim)(i => pc(i, j))
      val m = c.indices.maxBy(i => math.abs(c(i)))
      if (c(m) < 0) c.map(x => -x) else c
    }
    PcaModel(dim, k, mean, comps, ratios.toArray,
      ratios.toArray.map(_ * totalVar))
  }

  /** Adds `projection` (array<double> of k coordinates) next to the
    * input columns — one codegen `vec_dot` per component against the raw
    * vector column, the mean shift folded to a scalar constant per
    * component.
    */
  def project(emb: DataFrame, vecCol: String, model: PcaModel): DataFrame = {
    val coords = model.components.map { c =>
      val compLit = array(c.map(lit).toSeq: _*)
      val meanDot = c.zip(model.mean).map { case (a, b) => a * b }.sum
      VectorExprs.dot(col(vecCol), compLit) - lit(meanDot)
    }
    emb.withColumn("projection", array(coords.toSeq: _*))
  }

  /** Whitened projection — PCA coordinates scaled to unit sample
    * variance (`y_j / √λ_j`, the OPQ/whitening step run before product
    * quantization or isotropic clustering): the per-component divisor
    * folds into the same constant-per-coordinate algebra as the mean
    * shift, so this is exactly [[project]]'s codegen map with different
    * literals. A degenerate component (λ ≈ 0: corpus rank below k)
    * whitens to 0 rather than blowing up.
    */
  def whiten(emb: DataFrame, vecCol: String, model: PcaModel): DataFrame = {
    val coords = model.components.zip(model.variance).map { case (c, v) =>
      val scale = if (v > 1e-12) 1.0 / math.sqrt(v) else 0.0
      val compLit = array(c.map(x => lit(x * scale)).toSeq: _*)
      val meanDot = c.zip(model.mean).map { case (a, b) => a * b }.sum * scale
      VectorExprs.dot(col(vecCol), compLit) - lit(meanDot)
    }
    emb.withColumn("whitened", array(coords.toSeq: _*))
  }

  /** ‖x − μ‖² as codegen scalar algebra: ‖x‖² − 2⟨x, μ⟩ + ‖μ‖² — no
    * centered intermediate array.
    */
  def centeredSqNorm(vecCol: String, model: PcaModel): org.apache.spark.sql.Column = {
    val meanLit = array(model.mean.map(lit).toSeq: _*)
    val meanSq = model.mean.map(x => x * x).sum
    VectorExprs.dot(col(vecCol), col(vecCol)) -
      lit(2.0) * VectorExprs.dot(col(vecCol), meanLit) + lit(meanSq)
  }
}
