package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.Tables

/** Robustness: every relational/pipeline query degrades to an empty (or
  * constant-only) result on empty tables instead of crashing. ML fits
  * legitimately require data (k-means with k > 0 has no model on zero
  * rows), so ml_* queries are excluded, as are the clustering-backed
  * sim_ann/multimodal paths.
  */
class EmptyInputSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Empty copies of all tables, same schemas, staged once. */
  lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    // events.parquet is TIMESTAMP(NANOS); read it as long like Tables.events
    // does (the empty copy then round-trips as a plain INT64 column)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.names.foreach { t =>
      Tables.load(spark, SparkTestSession.sfDir, t)
        .limit(0).write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private val requiresData = Set(
    "ml_doc_clusters", "ml_kmeans_assign", "ml_kmeans_cosine_sizes",
    "ml_lloyd_losses", "sim_ann_ivf",
    // route through the persisted IVF index (a k-means fit needs rows)
    "sim_topk", "sim_ann_ivfpq", "sim_radius", "sim_ivf_drift",
    "sim_knn_graph", "sim_knn_components",
    "sim_ann_sq8", "sim_ann_opq", "sim_ann_join", "sim_mmr_rerank",
    "tp_decontaminate_semantic", "ret_hybrid_rrf",
    "sim_hard_negatives", "ret_eval_metrics",
    // PCA's Gramian pass needs rows (no covariance of nothing)
    "ml_pca_project", "ml_pca_variance", "ml_pca_whiten")

  SparkEntry.queries.toSeq.sortBy(_._1)
    .filterNot { case (n, _) => requiresData(n) }
    .foreach { case (name, fn) =>
      test(s"$name tolerates empty inputs") {
        val n = fn(spark, emptyDir).count()
        assert(n >= 0)
      }
    }
}
