package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Tables
import graft.text.TextOps

/** Sketch accuracy contracts that are PROBABILISTIC (per-query bound with
  * confidence < 1): they hold deterministically on the pinned fixture +
  * seed, so they live here — the declared t7 query hashes only the
  * guaranteed no-undercount invariant against its oracle, because a
  * data/seed change could flip a high-probability bracket into a spurious
  * correctness failure at the driver gate.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("CMS estimates bracket the exact heavy-hitter counts within eps*total on the fixture") {
    val eps = 1e-4
    val toks = Tables.documents(spark, SparkTestSession.sfDir)
      .select(explode(TextOps.tokens(TextOps.clean(col("text")))).as("token"))
    val top = toks.groupBy("token").agg(count(lit(1)).as("f"))
      .orderBy(desc("f"), asc("token")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.nonEmpty)
    val skBytes = toks
      .agg(count_min_sketch(col("token"), lit(eps), lit(0.999), lit(42)).as("sk"))
      .head.getAs[Array[Byte]](0)
    val sk = org.apache.spark.util.sketch.CountMinSketch.readFrom(skBytes)
    val slack = math.ceil(eps * sk.totalCount()).toLong
    top.foreach { case (t, f) =>
      val est = sk.estimateCount(t)
      assert(est >= f, s"CMS undercounted '$t': $est < $f (impossible for CMS)")
      assert(est <= f + slack,
        s"CMS estimate for '$t' outside the eps bracket: $est > $f + $slack")
    }
  }
}
