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

  test("quantile sketch brackets the exact percentiles") {
    import org.apache.spark.sql.functions._
    val d = SparkTestSession.sfDir
    // declared output is a comma-joined string (driver-hashable form)
    val approx = SparkEntry.queries("a_quantile_sketch")(spark, d)
      .collect()
      .map(r => r.getString(0) -> r.getString(1).split(",").map(_.toDouble).toSeq)
      .toMap
    val exact = graft.io.Tables.lineitem(spark, d)
      .groupBy("l_returnflag")
      .agg(percentile(col("l_extendedprice"), lit(0.5)).as("p50"),
        percentile(col("l_extendedprice"), lit(0.95)).as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (p50, p95)) =>
      assert(math.abs(approx(k)(0) - p50) / p50 < 0.05, s"$k p50 off: ${approx(k)(0)} vs $p50")
      assert(math.abs(approx(k)(1) - p95) / p95 < 0.05, s"$k p95 off: ${approx(k)(1)} vs $p95")
    }
  }

  test("a7b approx distinct is within the 2% HLL error bound (x5 slack)") {
    import org.apache.spark.sql.functions._
    val d = SparkTestSession.sfDir
    val approx = SparkEntry.queries("a7b_approx_distinct")(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.io.Tables.lineitem(spark, d)
      .groupBy("l_returnflag").agg(countDistinct("l_orderkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(1L, (n * 0.10).toLong),
        s"$k: approx ${approx(k)} vs exact $n")
    }
  }
}
