package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Tables
import graft.queries.Skew

/** Scale-posture mechanics: salted aggregation/join correctness, and
  * bucketed tables giving an exchange-free co-located join.
  */
class SkewBucketSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val d = SparkTestSession.sfDir

  test("salted aggregation equals the plain aggregation") {
    val li = Tables.lineitem(spark, d)
    val plain = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedAggregate(li, Seq("l_returnflag"), saltBuckets = 7,
      partialAggs = Seq(sum("l_quantity").as("ps"), count(lit(1)).as("pn")),
      finalAggs = Seq(sum("ps").as("s"), sum("pn").as("n")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salted join equals the plain join") {
    val o = Tables.orders(spark, d).select("o_orderkey", "o_orderpriority")
    val pri = o.select("o_orderpriority").distinct()
      .withColumn("pri_rank", length(col("o_orderpriority")))
    val plain = o.join(pri, "o_orderpriority")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"), max("pri_rank").as("r"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val salted = Skew.saltedJoin(o, pri, "o_orderpriority", saltBuckets = 5)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"), max("pri_rank").as("r"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(salted == plain)
  }

  test("bucketed tables join without any shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    // the in-memory catalog forgets tables between JVMs but their
    // warehouse directories persist — clear them
    Seq("orders_bkt", "lineitem_bkt").foreach { t =>
      val p = java.nio.file.Paths.get(s"spark-warehouse/$t")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    Tables.orders(spark, d).select("o_orderkey", "o_orderpriority")
      .write.mode("overwrite")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bkt")
    Tables.lineitem(spark, d).select("l_orderkey", "l_quantity")
      .write.mode("overwrite")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bkt")
    val joined = spark.table("orders_bkt")
      .hint("merge")
      .join(spark.table("lineitem_bkt"),
        col("o_orderkey") === col("l_orderkey"))
    val plan = joined.queryExecution.sparkPlan.toString
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() > 0)
  }

  test("bloom pre-filtered join equals the plain join and actually filters") {
    val li = Tables.lineitem(spark, d)
    val bigOrders = Tables.orders(spark, d).filter(col("o_totalprice") > 450000.0)
    val plain = li.join(bigOrders, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_totalprice")
    val bloomed = graft.queries.Skew
      .bloomPrefilteredJoin(li, "l_orderkey", bigOrders, "o_orderkey",
        expectedItems = 10000L, fpp = 0.01)
      .select("l_orderkey", "l_linenumber", "o_totalprice")
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getDouble(2))).sorted.toSeq
    assert(key(bloomed) == key(plain), "bloom pre-filter changed the join result")

    // the probe filter must be the NATIVE BloomFilterMightContain
    // expression (codegen), never a boxed scala UDF on the hot path
    val executed = bloomed.queryExecution.executedPlan.toString
    assert(executed.contains("might_contain"),
      s"expected native might_contain probe in:\n$executed")
    assert(!executed.contains("UDF"),
      s"scala UDF on the bloom probe path:\n$executed")

    // the pre-filter must actually drop most non-matching probe rows
    val bloom = bigOrders.stat.bloomFilter("o_orderkey", 10000L, 0.01)
    val kept = li.filter(udf((k: java.lang.Long) =>
      k != null && bloom.mightContainLong(k)).apply(col("l_orderkey"))).count()
    assert(kept < li.count() / 2,
      s"bloom kept $kept of ${li.count()} probe rows — not selective")
  }

  test("bloom pre-filter on a non-integral key falls back to the plain join") {
    import spark.implicits._
    val probe = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
    val build = Seq(("a", 10), ("c", 30)).toDF("bk", "bv")
    val out = graft.queries.Skew
      .bloomPrefilteredJoin(probe, "k", build, "bk", expectedItems = 10L)
    assert(out.queryExecution.executedPlan.toString.indexOf("might_contain") < 0,
      "string key must not be cast-to-long probed")
    assert(out.collect().map(_.getString(0)).sorted.toSeq == Seq("a", "c"))
  }

  test("bloom pre-filter with integral probe but non-integral BUILD key falls back") {
    import spark.implicits._
    // Spark's implicit cast makes 1L = '1' match in the plain join; a
    // string-built bloom filter probed with putLong semantics would have
    // silently dropped every such row before the fix
    val probe = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v")
    val build = Seq(("1", 10), ("3", 30)).toDF("bk", "bv")
    val out = graft.queries.Skew
      .bloomPrefilteredJoin(probe, "k", build, "bk", expectedItems = 10L)
    assert(out.queryExecution.executedPlan.toString.indexOf("might_contain") < 0,
      "mismatched key types must skip the bloom filter entirely")
    assert(out.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L),
      "fallback must preserve the plain join's implicit-cast matches")
  }

  test("AQE splits a skewed sort-merge join at runtime (the unplanned-skew path)") {
    // saltedJoin/saltedAggregate cover skew KNOWN ahead of time; this pins
    // the runtime half of the posture: AQE detecting a hot reduce partition
    // mid-query and splitting it, with thresholds scaled to test data
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key owning most rows, fat payload to trip the byte threshold
      val left = spark.range(0, 60000)
        .select(when(col("id") < 50000L, 0L).otherwise(col("id")).as("k"),
          concat(lit("x" * 64), col("id")).as("payload"))
      val right = spark.range(0, 1000).select(col("id").as("k"), lit(1).as("r"))
      val joined = left.hint("merge").join(right, "k")
      // materialize THIS Dataset's own query execution (count() would spawn
      // a separate one and leave this adaptive plan unfinalized)
      assert(joined.collect().length == 50000) // the hot key is the only matching one
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the hot partition skewed:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
