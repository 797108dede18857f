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

  test("HLL inclusion-exclusion overlap tracks a KNOWN synthetic overlap within the declared bound") {
    import spark.implicits._
    // sides A = [0, 3000), B = [2000, 5000): true overlap 1000
    val rows = ((0 until 3000).map(i => (s"w$i", true, i >= 2000)) ++
      (3000 until 5000).map(i => (s"w$i", false, true)))
      .toDF("word", "in_a", "in_b")
    val r = rows
      .agg(
        approx_count_distinct(when(col("in_a"), col("word")), 0.02).as("ha"),
        approx_count_distinct(when(col("in_b"), col("word")), 0.02).as("hb"),
        approx_count_distinct(col("word"), 0.02).as("hu"))
      .select((col("ha") + col("hb") - col("hu")).as("est"))
      .head.getLong(0)
    // the declared dd_vocab_overlap bound: |est - exact| <= (|A|+|B|)/10
    assert(math.abs(r - 1000L) <= (3000L + 3000L) / 10,
      s"inclusion-exclusion estimate $r strayed outside the declared bound")
  }

  test("HLL sketches survive a parquet persist and union losslessly") {
    val ev = Tables.events(spark, SparkTestSession.sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft-hll")
      .resolve("daily_sketches").toString
    // persist per-day sketch binaries (the incremental-cardinality store)
    ev.groupBy(date_trunc("day", col("ts")).as("day_ts"))
      .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
      .write.parquet(dir)
    // reload + merge == sketching the whole table in one pass
    val merged = spark.read.parquet(dir)
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(true)))
        .as("est"))
      .head.getLong(0)
    val direct = ev
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(14)))
        .as("est"))
      .head.getLong(0)
    assert(merged == direct,
      s"union of persisted daily sketches ($merged) != one-pass sketch ($direct)")
    // at fixture cardinality the lgK=14 sketch is hash-set-exact
    val exact = ev.select(countDistinct(col("user_id"))).head.getLong(0)
    assert(merged == exact,
      s"sketch estimate $merged drifted from exact $exact at trivial cardinality")
  }

  test("an incremental day closes the gap: union(old days, new day) tracks exact") {
    import spark.implicits._
    // two "days" arriving separately; sketches merged without rescanning day 1
    val d1 = (1L to 500L).toDF("uid")
    val d2 = (400L to 900L).toDF("uid") // overlap 400..500
    val s1 = d1.agg(hll_sketch_agg(col("uid"), lit(14)).as("sk"))
    val s2 = d2.agg(hll_sketch_agg(col("uid"), lit(14)).as("sk"))
    val est = s1.unionByName(s2)
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(true))))
      .head.getLong(0)
    assert(est == 900L, s"merged estimate $est != exact 900 at hash-set scale")
  }
}
