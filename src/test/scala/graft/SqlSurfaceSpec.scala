package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Tables
import graft.queries.SqlSurface

/** Semantic invariants for the second declared-query batch (the DuckDB
  * oracle is the primary gate; these pin the properties the oracle hash
  * alone wouldn't explain to a reader).
  */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val d = SparkTestSession.sfDir

  test("j_outer_left: customer counts sum to total customers (zero-order customers kept)") {
    val dist = SqlSurface.queries("j_outer_left")(spark, d)
    val total = dist.agg(sum("n_customers")).head.getLong(0)
    assert(total == Tables.customer(spark, d).count())
  }

  test("tp_weighted_sample: deterministic A-Res keys, negative, capped at n") {
    val r1 = SqlSurface.queries("tp_weighted_sample")(spark, d)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val r2 = SqlSurface.queries("tp_weighted_sample")(spark, d)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(r1.toSeq == r2.toSeq, "no RNG: identical runs must agree exactly")
    assert(r1.forall(_._2 < 0.0), "ln(u)/w keys are strictly negative")
    val nDocs = Tables.documents(spark, d).count()
    assert(r1.length == math.min(200L, nDocs).toInt)
  }

  test("deterministicShuffle: total order is seeded, permutes, and is append-stable") {
    import spark.implicits._
    val docs = (0L until 200L).toDF("doc_id")
    def order(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      SqlSurface.deterministicShuffle(df, "doc_id", 42L)
        .orderBy("shuffle_key", "doc_id").select("doc_id")
        .as[Long].collect().toSeq
    val full = order(docs)
    // a permutation of the input, deterministic across runs, and not the
    // identity (it actually shuffles)
    assert(full.sorted == (0L until 200L))
    assert(full == order(docs))
    assert(full != (0L until 200L).toSeq)
    // a different seed yields a different order
    val other = SqlSurface.deterministicShuffle(docs, "doc_id", 7L)
      .orderBy("shuffle_key", "doc_id").select("doc_id").as[Long].collect().toSeq
    assert(other != full)
    // APPEND-STABLE: keys are pure functions of (id, seed), so shuffling
    // only the first half preserves those docs' relative order exactly
    val half = order((0L until 100L).toDF("doc_id"))
    assert(full.filter(_ < 100L) == half,
      "appending docs must never reorder existing ones")
  }

  test("j_outer_full: covers every nation present on either side, nulls where absent") {
    val out = SqlSurface.queries("j_outer_full")(spark, d).collect()
    val custNations = Tables.customer(spark, d).filter(col("c_acctbal") > 7000.0)
      .select(col("c_nationkey").cast("long")).distinct().collect().map(_.getLong(0)).toSet
    val suppNations = Tables.supplier(spark, d)
      .select(col("s_nationkey").cast("long")).distinct().collect().map(_.getLong(0)).toSet
    assert(out.map(_.getLong(0)).toSet == (custNations ++ suppNations))
    // a nation on only one side leaves the other count null
    out.foreach { r =>
      val n = r.getLong(0)
      assert(r.isNullAt(1) == !custNations(n))
      assert(r.isNullAt(2) == !suppNations(n))
    }
  }

  test("a_pivot: cross-tab cells sum back to the row count") {
    val p = SqlSurface.queries("a_pivot")(spark, d)
    val cells = p.agg(sum(col("F") + col("O") + col("P"))).head.getLong(0)
    assert(cells == Tables.orders(spark, d).count())
  }

  test("a_grouping_sets: exactly the two declared one-dim rollups, flags consistent") {
    val rows = SqlSurface.queries("a_grouping_sets")(spark, d).collect()
    rows.foreach { r =>
      val (gRf, gLs) = (r.getInt(4), r.getInt(5))
      assert(Set((0, 1), (1, 0)).contains((gRf, gLs)), "only single-dim sets declared")
      assert(r.isNullAt(0) == (gRf == 1))
      assert(r.isNullAt(1) == (gLs == 1))
    }
    val nRows = Tables.lineitem(spark, d).count()
    val perSet = rows.groupBy(r => r.getInt(4)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(perSet(0) == nRows && perSet(1) == nRows, "each set partitions all rows")
  }

  test("tp_temperature_mix: α<1 upweights tail domains, total tracks budget, deterministic") {
    val mix = SqlSurface.queries("tp_temperature_mix")(spark, d)
    val kept = mix.groupBy("lang").agg(count(lit(1)).as("n_kept"),
      first("rate_bp").as("rate_bp")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val corpus = Tables.documents(spark, d).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // keep-RATE is monotone non-increasing in domain size: p_d/n_d ∝
    // 1/sqrt(n_d) — the defining property of α=0.5 temperature sampling
    val bySize = corpus.toSeq.sortBy(_._2)
    bySize.sliding(2).foreach {
      case Seq((small, _), (big, _)) =>
        assert(kept(small)._2 >= kept(big)._2,
          s"smaller domain $small got a lower rate than $big")
      case _ =>
    }
    // every domain is sampled (no domain starves), and the kept total
    // tracks the half-corpus budget (hash threshold is uniform-ish)
    assert(corpus.keySet.forall(l => kept.contains(l) && kept(l)._1 > 0))
    val total = kept.values.map(_._1).sum.toDouble
    val budget = corpus.values.sum / 2.0
    assert(total > budget * 0.8 && total < budget * 1.2,
      s"kept $total vs budget $budget")
    // deterministic: a second run yields the identical keep set
    val again = SqlSurface.queries("tp_temperature_mix")(spark, d)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == mix.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("tp_curriculum: bins are monotone in difficulty, near-balanced, deterministic") {
    val cur = SqlSurface.queries("tp_curriculum")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val n = cur.length
    assert(n == Tables.documents(spark, d).count())
    assert(cur.forall(r => r._3 >= 0 && r._3 < 4))
    // monotone: the bin never decreases as difficulty (token count) grows
    cur.sortBy(r => (r._2, r._1)).map(_._3).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a <= b, "bins must be monotone in n_tokens")
      case _ =>
    }
    // equal scores share a bin (ties never straddle a boundary)
    cur.groupBy(_._2).values.foreach(g =>
      assert(g.map(_._3).distinct.length == 1, "a score straddled bins"))
    // near-balanced: each bin within the largest score-tie group of n/4
    val maxTie = cur.groupBy(_._2).values.map(_.length).max
    val sizes = cur.groupBy(_._3).values.map(_.length)
    assert(sizes.forall(s => s <= n / 4 + maxTie && s > 0),
      s"bin sizes $sizes too skewed for n=$n, maxTie=$maxTie")
    // deterministic, including the within-bin order keys
    val again = SqlSurface.queries("tp_curriculum")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(again.toSet == cur.toSet)
  }

  test("tp_hash_split: deterministic, buckets in [0,10), ~80/20 split") {
    val s1 = SqlSurface.queries("tp_hash_split")(spark, d).collect()
    val s2 = SqlSurface.queries("tp_hash_split")(spark, d).collect()
    assert(s1.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      s2.map(r => r.getLong(0) -> r.getLong(1)).toMap, "split is reproducible")
    assert(s1.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 10))
    val train = s1.count(_.getString(2) == "train").toDouble / s1.length
    assert(train > 0.6 && train < 0.95, s"train fraction $train far from 0.8")
  }

  test("tp_keep_best: keeper belongs to its group and has max token count") {
    val docs = Tables.documents(spark, d)
      .withColumn("content_hash", md5(col("text")))
      .withColumn("n_tokens", graft.text.TextAnalysis.tokenCount(col("text")))
      .select("doc_id", "content_hash", "n_tokens")
      .collect()
      .groupBy(_.getString(1))
    val out = SqlSurface.queries("tp_keep_best")(spark, d).collect()
    assert(out.length == docs.size)
    out.foreach { r =>
      val members = docs(r.getString(0))
      val keeper = r.getLong(1)
      assert(members.exists(_.getLong(0) == keeper))
      val maxTok = members.map(_.getAs[Number](2).longValue).max
      assert(members.find(_.getLong(0) == keeper).get.getAs[Number](2).longValue == maxTok)
      assert(r.getLong(2) == members.length)
    }
  }

  test("q_scalar_subquery plans the scalar as a broadcast, not a per-row subquery") {
    val plan = SqlSurface.queries("q_scalar_subquery")(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast of the 1-row aggregate:\n$plan")
  }
}
