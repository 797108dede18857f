package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.similarity.Retrieval

/** Retrieval-metrics invariants on a hand-computed fixture: the DCG
  * fold, the R=0 undefined conventions, and the rr=0 no-hit rule.
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // corpus labels: queries 1 and 2 share label "a" with ids 10, 11;
  // id 3 is the SOLE member of label "c" (R = 0 — recall/ndcg undefined)
  private lazy val labels = Seq(
    (1L, "a"), (2L, "a"), (10L, "a"), (11L, "a"),
    (20L, "b"), (21L, "b"), (3L, "c")
  ).toDF("vec_id", "label")

  test("hand-computed p@k / recall@k / rr / ndcg@k") {
    // query 1 top-3: rel at ranks 1 and 3 (10, 11 share label; 20 doesn't)
    val ranked = Seq(
      (1L, 10L, 1), (1L, 20L, 2), (1L, 11L, 3),
      // query 2: no relevant retrieved at all
      (2L, 20L, 1), (2L, 21L, 2), (2L, 3L, 3),
      // query 3: sole member of its label — R = 0
      (3L, 10L, 1), (3L, 20L, 2), (3L, 21L, 3)
    ).toDF("query_id", "neighbor_id", "rank")

    val m = Retrieval.metrics(ranked, labels, "vec_id", "label", k = 3)
      .collect().map(r => r.getLong(0) -> r).toMap

    def log2d(x: Double) = math.log(x) / math.log(2.0)
    // query 1: n_rel=2, R=3 (a has 4 members − self) capped at k=3
    val dcg1 = 1.0 / log2d(2) + 1.0 / log2d(4)
    val idcg1 = 1.0 / log2d(2) + 1.0 / log2d(3) + 1.0 / log2d(4)
    val q1 = m(1L)
    assert(q1.getDouble(1) == math.rint(2.0 / 3 * 1e6) / 1e6) // p@3
    assert(q1.getDouble(2) == math.rint(2.0 / 3 * 1e6) / 1e6) // recall (R=3)
    assert(q1.getDouble(3) == 1.0)                            // rr: first hit rank 1
    assert(q1.getDouble(4) == math.rint(dcg1 / idcg1 * 1e6) / 1e6)

    // query 2: nothing relevant retrieved -> p=0, recall=0, rr=0, ndcg=0
    val q2 = m(2L)
    assert(q2.getDouble(1) == 0.0 && q2.getDouble(2) == 0.0)
    assert(q2.getDouble(3) == 0.0)
    assert(q2.getDouble(4) == 0.0)

    // query 3: R=0 -> recall/ndcg NULL (undefined), p=0, rr=0
    val q3 = m(3L)
    assert(q3.getDouble(1) == 0.0 && q3.getDouble(3) == 0.0)
    assert(q3.isNullAt(2) && q3.isNullAt(4))
  }

  test("ranks past k are cut defensively") {
    val ranked = Seq((1L, 10L, 1), (1L, 11L, 7)).toDF("query_id", "neighbor_id", "rank")
    val m = Retrieval.metrics(ranked, labels, "vec_id", "label", k = 3)
      .collect().head
    assert(m.getDouble(1) == math.rint(1.0 / 3 * 1e6) / 1e6) // only rank 1 counted
  }

  test("an unlabeled neighbor counts as non-relevant, not dropped from the cut") {
    // id 99 has NO label row: it still occupies a rank slot with rel=0
    val ranked = Seq(
      (1L, 10L, 1), (1L, 99L, 2), (1L, 11L, 3)
    ).toDF("query_id", "neighbor_id", "rank")
    val m = Retrieval.metrics(ranked, labels, "vec_id", "label", k = 3)
      .collect().head
    assert(m.getDouble(1) == math.rint(2.0 / 3 * 1e6) / 1e6)
    // the case the left join actually CHANGES: a cut made entirely of
    // unlabeled neighbors must emit the query's zero-precision row (the
    // old inner join dropped every row and the query vanished)
    val allUnlabeled = Seq(
      (1L, 97L, 1), (1L, 98L, 2), (1L, 99L, 3)
    ).toDF("query_id", "neighbor_id", "rank")
    val z = Retrieval.metrics(allUnlabeled, labels, "vec_id", "label", k = 3)
      .collect()
    assert(z.length == 1, "an all-unlabeled cut must still report its query")
    assert(z.head.getDouble(1) == 0.0 && z.head.getDouble(3) == 0.0,
      "p@k and rr must be 0 on an all-unlabeled cut")
    // ... while an unlabeled QUERY has no ground truth and emits no row
    val orphan = Seq((99L, 10L, 1)).toDF("query_id", "neighbor_id", "rank")
    assert(Retrieval.metrics(orphan, labels, "vec_id", "label", k = 3).count() == 0)
  }

  test("hard negatives: label-disjoint, capped, contiguous ranks, sims non-increasing") {
    val d = SparkTestSession.sfDir
    val idx = graft.queries.PipelineOps.persistedIvfIndex(spark, d)
    val emb = graft.io.Tables.embeddings(spark, d)
    val hn = Retrieval.hardNegatives(idx,
      emb.filter(pmod(col("vec_id"), lit(100)) === 0), emb,
      "vec_id", "embedding", "label", k = 5,
      nprobe = idx.centroids.length, maxSim = 0.95)
    val lab = emb.select(col("vec_id"), col("label"))
    // no mined negative shares the anchor's label, none breaches the cap
    val bad = hn
      .join(lab.select(col("vec_id").as("query_id"), col("label").as("ql")), "query_id")
      .join(lab.select(col("vec_id").as("neighbor_id"), col("label").as("nl")), "neighbor_id")
      .filter(col("ql") === col("nl") || col("hn_sim") >= 0.95)
      .count()
    assert(bad == 0)
    // per anchor: ranks 1..n contiguous, hn_sim non-increasing in rank
    val rows = hn.orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to sorted.length))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 >= b._3, s"sim increasing: $a -> $b")
        case _ =>
      }
    }
  }

  test("a perfect ranking scores 1.0 everywhere") {
    val ranked = Seq((1L, 2L, 1), (1L, 10L, 2), (1L, 11L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val r = Retrieval.metrics(ranked, labels, "vec_id", "label", k = 3)
      .collect().head
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 1.0
      && r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0)
  }
}
