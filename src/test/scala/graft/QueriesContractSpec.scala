package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract checks the driver relies on: every query builds and executes at
  * sf0.001; every oracle key has a matching query; entry returns rows.
  */
class QueriesContractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("every oracle key has a corresponding query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name executes with non-empty schema") {
      val df = fn(spark, SparkTestSession.sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("tp_pipeline_e2e composes its stages: survivors clean, decontaminated, packed in order") {
    import org.apache.spark.sql.functions._
    val d = SparkTestSession.sfDir
    val e2e = SparkEntry.queries("tp_pipeline_e2e")(spark, d)
    val clean = SparkEntry.queries("tp_corpus_clean")(spark, d).select("doc_id")
    val contaminated = SparkEntry.queries("tp_decontaminate")(spark, d).select("doc_id")
    assert(e2e.count() > 0)
    // survivors ⊆ clean
    assert(e2e.join(clean, Seq("doc_id"), "left_anti").count() == 0)
    // the eval subset and every contaminated doc are gone
    assert(e2e.filter(pmod(col("doc_id"), lit(97)) === 0).count() == 0)
    assert(e2e.join(contaminated, "doc_id").count() == 0)
    // bins are non-decreasing in doc_id within each shard (next-fit by
    // cumulative offset), and every doc's tokens are positive
    val bad = e2e.withColumn("prev_bin",
      lag("bin", 1).over(org.apache.spark.sql.expressions.Window
        .partitionBy("shard").orderBy("doc_id")))
      .filter(col("prev_bin").isNotNull && col("bin") < col("prev_bin"))
    assert(bad.count() == 0)
    assert(e2e.filter(col("n_tokens") <= 0).count() == 0)
  }

  test("quantile sketch brackets the exact percentiles") {
    import org.apache.spark.sql.functions._
    val d = SparkTestSession.sfDir
    // declared output IS the bounded-error contract: per group, the
    // sketched q50/q95 must land between the exact quantiles at rank
    // ±0.02 (flags computed in-query, oracle pins them to 1)
    val rows = SparkEntry.queries("a_quantile_sketch")(spark, d)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2), r.getInt(3)))
      .toMap
    val groups = graft.io.Tables.lineitem(spark, d)
      .select("l_returnflag").distinct().collect().map(_.getString(0)).toSet
    assert(rows.keySet == groups)
    rows.foreach { case (k, (n, ok50, ok95)) =>
      assert(n > 0, s"$k empty group")
      assert(ok50 == 1, s"$k sketched p50 outside the exact ±0.02-rank bracket")
      assert(ok95 == 1, s"$k sketched p95 outside the exact ±0.02-rank bracket")
    }
  }

  test("a7b approx distinct is within the declared 10% bound of the exact count") {
    import org.apache.spark.sql.functions._
    val d = SparkTestSession.sfDir
    // declared output carries the exact count plus the in-query bound flag
    val rows = SparkEntry.queries("a7b_approx_distinct")(spark, d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    val exact = graft.io.Tables.lineitem(spark, d)
      .groupBy("l_returnflag").agg(countDistinct("l_orderkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(rows(k)._1 == n, s"$k: declared exact ${rows(k)._1} != recomputed $n")
      assert(rows(k)._2 == 1, s"$k: HLL sketch outside the 10% bound")
    }
  }
}
