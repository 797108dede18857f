package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval evaluation — the measurement half of the retrieval stack
  * (IVF/PQ/SQ8 probes, RRF fusion, MMR re-rank all tune against these
  * numbers): per-query precision@k, recall@k, reciprocal rank, and
  * nDCG@k over a ranked result table and a relevance labeling.
  *
  * Everything is one pass over the ranked rows (q·k of them — never
  * corpus-shaped): two equi-joins attach query/neighbor labels, one
  * groupBy(query) folds the rank-discounted sums, and the label
  * population counts (distinct-label-sized, broadcast) supply the
  * recall/IDCG denominators. The ideal DCG is computed per query from
  * `sequence(1, min(R, k))` — a k-bounded array fold, not a join.
  *
  * Conventions (all engine-portable, replayed by the DuckDB oracle):
  * relevance is binary label equality; `rr` is 0 when no relevant
  * result is retrieved; `recall_at_k`/`ndcg_at_k` are NULL when the
  * query's label has no other member in the corpus (R = 0 — the metric
  * is undefined, not zero); outputs round to 6 dp (house float rule).
  */
object Retrieval {

  /** Hard-negative mining for contrastive training: per anchor, the
    * `k` most-similar corpus vectors with a DIFFERENT label, capped at
    * `maxSim` — close enough to be informative gradients, label-disjoint
    * so they are true negatives, and capped so near-duplicates/label
    * noise at the very top of the similarity range are excluded (the
    * standard false-negative guard). Candidates come from the IVF probe
    * ([[Similarity.scoreIvf]] — corpus-linear, never all-pairs; at
    * `nprobe == nlist` the mining is exact), similarity is ROUNDED to
    * 6 dp before the cut (house portable-cut convention), and the
    * per-anchor top-k is the bounded-heap `top_k_by` aggregate — the
    * exchange moves ≤ k skinny rows per anchor per task, the vectors
    * never ride it. Output: (query_id, neighbor_id, hn_sim, rank).
    */
  def hardNegatives(index: Similarity.IvfIndex, queries: DataFrame,
                    labels: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, k: Int, nprobe: Int,
                    maxSim: Double = 0.95): DataFrame = {
    val lab = labels.select(col(idCol).as("__id"), col(labelCol).as("__label"))
    Similarity.scoreIvf(index, queries, idCol, vecCol, nprobe)
      .withColumn("hn_sim", round(col("cosine_sim"), 6))
      .filter(col("hn_sim") < maxSim)
      .select("query_id", "neighbor_id", "hn_sim")
      .join(lab.select(col("__id").as("query_id"), col("__label").as("qlabel")),
        "query_id")
      .join(lab.select(col("__id").as("neighbor_id"), col("__label").as("nlabel")),
        "neighbor_id")
      .filter(col("qlabel") =!= col("nlabel"))
      .groupBy("query_id")
      .agg(graft.functions.TopKBy.topKBy(col("hn_sim"), col("neighbor_id"),
        struct(col("neighbor_id"), col("hn_sim")), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.payload.neighbor_id").as("neighbor_id"),
        col("col.payload.hn_sim").as("hn_sim"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** @param ranked  (query_id, neighbor_id, rank) with rank 1-based —
    *                the shape every probe in this package emits
    * @param labels  (idCol, labelCol) relevance labeling of the corpus.
    *                QUERIES must be covered: a query_id with no label
    *                row has no ground truth and emits no metrics row
    *                (inner join, by design — as is a query whose ranked
    *                rows all fall past k, since an empty cut has no
    *                measurable precision). NEIGHBORS need not be: an
    *                unlabeled neighbor counts as non-relevant (left
    *                join, rel = 0), so a query whose ENTIRE cut is
    *                unlabeled still emits its zero-precision row
    *                instead of vanishing from the report.
    * @param k       the cut the metrics are reported at (ranks > k are
    *                filtered out defensively; self-matches are assumed
    *                already excluded, as the probes guarantee)
    */
  def metrics(ranked: DataFrame, labels: DataFrame, idCol: String,
              labelCol: String, k: Int): DataFrame = {
    val lab = labels.select(col(idCol).as("__id"), col(labelCol).as("__label"))
    val labCounts = lab.groupBy("__label").agg(count(lit(1)).as("n_label"))

    val rel = ranked
      .filter(col("rank") <= k)
      .join(lab.select(col("__id").as("query_id"), col("__label").as("qlabel")),
        "query_id")
      .join(lab.select(col("__id").as("neighbor_id"), col("__label").as("nlabel")),
        Seq("neighbor_id"), "left")
      .withColumn("rel",
        coalesce((col("qlabel") === col("nlabel")).cast("int"), lit(0)))

    rel.groupBy("query_id", "qlabel")
      .agg(
        sum("rel").as("n_rel"),
        sum(col("rel").cast("double") / log2(col("rank") + lit(1))).as("dcg"),
        min(when(col("rel") === 1, col("rank"))).as("first_rel"))
      .join(broadcast(labCounts.withColumnRenamed("__label", "qlabel")),
        Seq("qlabel"), "left")
      .withColumn("rk", least(col("n_label") - 1, lit(k)).cast("int"))
      // the ideal DCG depends only on rk ∈ [1, k]: fold the k cumulative
      // sums at PLAN TIME and emit a CaseWhen lookup — stays inside
      // whole-stage codegen (an aggregate-over-sequence HOF would run
      // interpreted), and the sequential 1..rk summation order matches
      // the oracle's fold
      .withColumn("idcg", {
        val cums = (1 to k).scanLeft(0.0) { (acc, i) =>
          acc + 1.0 / (math.log(i + 1.0) / math.log(2.0))
        }.tail
        (1 to k).foldLeft(lit(null).cast("double")) { (acc, j) =>
          when(col("rk") === j, lit(cums(j - 1))).otherwise(acc)
        }
      })
      .select(
        col("query_id"),
        round(col("n_rel") / k, 6).as("p_at_k"),
        when(col("n_label") > 1,
          round(col("n_rel") / (col("n_label") - 1), 6)).as("recall_at_k"),
        round(coalesce(lit(1.0) / col("first_rel"), lit(0.0)), 6).as("rr"),
        when(col("rk") >= 1, round(col("dcg") / col("idcg"), 6)).as("ndcg_at_k"))
  }
}
