package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

/** The native-expression extension surface: registration makes vec_dot a
  * first-class SQL function (same injection as
  * `spark.sql.extensions=graft.functions.GraftExtensions`).
  */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("vec_dot is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val d = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect().head.getDouble(0)
    assert(d == 32.0)
    val f = spark.sql(
      "SELECT vec_dot(array(cast(1.5 AS float), cast(2 AS float)), " +
        "array(cast(2 AS float), cast(0.25 AS float))) AS d")
      .collect().head.getDouble(0)
    assert(f == 3.5)
  }

  test("optimizer rule rewrites the HOF dot-product pattern into vec_dot") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    spark.experimental.extraOptimizations =
      Seq(graft.functions.RewriteHofDotProduct)
    try {
      // parquet-backed input: a literal local relation constant-folds
      // away before the rewrite would even be visible
      val emb = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
      val df = emb.select(col("vec_id"),
        aggregate(zip_with(col("embedding"), col("embedding"),
          (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v).as("d"))
      assert(df.queryExecution.optimizedPlan.toString.contains("vec_dot"),
        df.queryExecution.optimizedPlan.toString)
      val viaKernel = emb.select(col("vec_id"),
        graft.functions.VectorExprs.dot(col("embedding"), col("embedding")).as("d"))
      val a = df.orderBy("vec_id").collect().map(_.getDouble(1)).toSeq
      val b = viaKernel.orderBy("vec_id").collect().map(_.getDouble(1)).toSeq
      assert(a == b)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("nfc_normalize composes decomposed sequences; normalizeText canonicalizes") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    GraftFunctions.register(spark)
    val composed = "caf\u00e9"          // e-acute as one codepoint
    val decomposed = "cafe\u0301"       // e + COMBINING ACUTE ACCENT
    val rows = Seq((1L, decomposed), (2L, composed), (3L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val out = rows.select(col("id"),
      graft.functions.TextExprs.nfcNormalize(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).contains(composed), "NFC must compose the decomposed accent")
    assert(out(2L).contains(composed), "already-NFC input is the identity")
    assert(out(3L).isEmpty, "null stays null")
    // the full normalization chain: NFC + lower + control-strip + collapse
    val messy = "  CAFE\u0301\tx y   z "   // decomposed UPPERCASE + tab + runs
    val norm = Seq(Tuple1(messy)).toDF("t")
      .select(graft.text.TextAnalysis.normalizeText(col("t")).as("n"))
      .head.getString(0)
    assert(norm == s"$composed x y z", s"got '$norm'")
    // and the SQL registration round-trips
    assert(spark.sql(s"SELECT nfc_normalize('$decomposed') AS n")
      .head.getString(0) == composed)
  }

  test("count_in_set counts duplicates, ignores nulls, and matches the HOF form") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT count_in_set(array('a','b','a','c', cast(null as string)), array('a','c')) AS n, " +
        "size(filter(array('a','b','a','c', cast(null as string)), " +
        "  t -> array_contains(array('a','c'), t))) AS hof")
      .collect().head
    assert(r.getLong(0) == 3L)
    assert(r.getInt(1).toLong == r.getLong(0), "must match the HOF it replaces")
  }

  test("char_code_sum is callable from SQL and matches the HOF form") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT char_code_sum('abc') AS s, char_code_sum('') AS e, " +
        "aggregate(split('abc', ''), 0L, (acc, c) -> acc + ascii(c)) AS hof")
      .collect().head
    assert(r.getLong(0) == 97 + 98 + 99)
    assert(r.getLong(1) == 0L)
    assert(r.getLong(2) == r.getLong(0), "must match the HOF it replaces")
  }

  test("vec_sqdist is callable from SQL and matches the algebra") {
    GraftFunctions.register(spark)
    val d = spark.sql(
      "SELECT vec_sqdist(array(1.0d, 2.0d, 3.0d), array(4.0d, 6.0d, 3.0d)) AS d")
      .collect().head.getDouble(0)
    assert(d == 25.0) // 9 + 16 + 0
  }

  test("optimizer rule rewrites the HOF squared-distance pattern into vec_sqdist") {
    import org.apache.spark.sql.functions._
    spark.experimental.extraOptimizations =
      Seq(graft.functions.RewriteHofDotProduct)
    try {
      val emb = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
      val hof = emb.select(col("vec_id"),
        aggregate(zip_with(col("embedding"), col("embedding"),
          (x, y) => (x.cast("double") - y.cast("double")) *
            (x.cast("double") - y.cast("double"))),
          lit(0.0), (acc, v) => acc + v).as("d"))
      assert(hof.queryExecution.optimizedPlan.toString.contains("vec_sqdist_hof"),
        hof.queryExecution.optimizedPlan.toString)
      // self-distance is exactly 0 for every row
      assert(hof.collect().forall(_.getDouble(1) == 0.0))
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("optimizer rule leaves the mixed (x-y)*(y-x) form alone (it is NOT a squared distance)") {
    import org.apache.spark.sql.functions._
    spark.experimental.extraOptimizations =
      Seq(graft.functions.RewriteHofDotProduct)
    try {
      val emb = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
      val df = emb.select(
        aggregate(zip_with(col("embedding"), col("embedding"),
          (x, y) => (x.cast("double") - y.cast("double")) *
            (y.cast("double") - x.cast("double"))),
          lit(0.0), (acc, v) => acc + v).as("d"))
      val p = df.queryExecution.optimizedPlan.toString
      assert(!p.contains("vec_sqdist") && !p.contains("vec_dot"), p)
      assert(df.count() > 0)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("rewritten HOF sqdist matches zip_with null semantics exactly") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("a", ArrayType(DoubleType, containsNull = true)),
      StructField("b", ArrayType(DoubleType, containsNull = true))))
    val rows = Seq(
      Row(1L, Seq(1.0, 2.0), Seq(3.0, 5.0)),        // -> 4 + 9 = 13.0
      Row(2L, Seq(1.0, 2.0, 5.0), Seq(3.0, 4.0)),   // length mismatch -> null
      Row(3L, Seq(1.0, null), Seq(3.0, 4.0)))       // null element -> null
    val path = "target/test-hof-null-sqdist"
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
    def hofSq(d: org.apache.spark.sql.DataFrame) = d.select(col("vec_id"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v).as("d"))
    def results(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val baseline = results(hofSq(df))
    assert(baseline == Map(1L -> Some(13.0), 2L -> None, 3L -> None))
    spark.experimental.extraOptimizations =
      Seq(graft.functions.RewriteHofDotProduct)
    try {
      val rewritten = hofSq(df)
      assert(rewritten.queryExecution.optimizedPlan.toString.contains("vec_sqdist_hof"),
        rewritten.queryExecution.optimizedPlan.toString)
      assert(results(rewritten) == baseline,
        "the session-wide rewrite must never change a user query's result")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("optimizer rule leaves non-dot aggregates alone") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    spark.experimental.extraOptimizations =
      Seq(graft.functions.RewriteHofDotProduct)
    try {
      val emb = spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
      val df = emb.select(
        aggregate(zip_with(col("embedding"), col("embedding"),
          (x, y) => x.cast("double") + y.cast("double")),
          lit(0.0), (acc, v) => acc + v).as("d"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("vec_dot"))
      assert(df.count() > 0)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("rewritten HOF dot matches zip_with null semantics exactly") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("a", ArrayType(DoubleType, containsNull = true)),
      StructField("b", ArrayType(DoubleType, containsNull = true))))
    val rows = Seq(
      Row(1L, Seq(1.0, 2.0), Seq(3.0, 4.0)),        // -> 11.0
      Row(2L, Seq(1.0, 2.0, 5.0), Seq(3.0, 4.0)),   // length mismatch -> null
      Row(3L, Seq(1.0, null), Seq(3.0, 4.0)))       // null element -> null
    val path = "target/test-hof-null-vecs"
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
    def hofDot(d: org.apache.spark.sql.DataFrame) = d.select(col("vec_id"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("d"))
    def results(d: org.apache.spark.sql.DataFrame): Map[Long, Option[Double]] =
      d.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val baseline = results(hofDot(df)) // un-rewritten HOF semantics
    assert(baseline == Map(1L -> Some(11.0), 2L -> None, 3L -> None))
    spark.experimental.extraOptimizations =
      Seq(graft.functions.RewriteHofDotProduct)
    try {
      val rewritten = hofDot(df)
      assert(rewritten.queryExecution.optimizedPlan.toString.contains("vec_dot_hof"),
        rewritten.queryExecution.optimizedPlan.toString)
      assert(results(rewritten) == baseline,
        "the session-wide rewrite must never change a user query's result")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("top_k_by rejects an unorderable tie type at ANALYSIS time, not mid-job") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(("a", 1L, 5.0)).toDF("g", "id", "score")
    // Dataset construction analyzes eagerly, so the agg() call itself throws
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("g").agg(graft.functions.TopKBy.topKBy(
        col("score"), map(col("id"), col("id")), col("id"), 2).as("top"))
    }
    assert(e.getMessage.contains("not orderable"), s"got: ${e.getMessage}")
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("g").agg(graft.functions.TopKBy.topKBy(
        col("g"), col("id"), col("id"), 2).as("top"))
    }
    assert(e2.getMessage.contains("must be numeric"), s"got: ${e2.getMessage}")
  }

  test("top_k_by treats NaN ord as greatest (Spark DESC sort order), heap stays consistent") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 5.0), ("a", 2L, Double.NaN), ("a", 3L, 9.0), ("a", 4L, 1.0)
    ).toDF("g", "id", "score").repartition(1)
    val got = df.groupBy("g")
      .agg(graft.functions.TopKBy.topKBy(col("score"), col("id"), col("id"), 2).as("top"))
      .select(col("top"))
      .collect().head
      .getSeq[org.apache.spark.sql.Row](0).map(e => (e.getDouble(0), e.getLong(1)))
    // NaN sorts greatest under DESC (like the window-rank form), then 9.0
    assert(got.size == 2)
    assert(got.head._1.isNaN && got.head._2 == 2L, s"got $got")
    assert(got(1) == (9.0, 3L), s"got $got")
  }

  test("top_k_by is callable from SQL after registration") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq(("a", 1L, 5.0), ("a", 2L, 9.0), ("a", 3L, 1.0), ("b", 4L, 2.0))
      .toDF("g", "id", "score").createOrReplaceTempView("topk_v")
    val composed = "caf\u00e9"
    val decomposed = "cafe\u0301"
    val threeByte = "\u20ac\u4e2d\u6587"
    val fourByte = "\ud83d\ude00"
    val got = spark.sql(
      s"""SELECT rolling_hash('$composed') AS composed,
                 rolling_hash('$decomposed') AS decomposed,
                 rolling_hash('$threeByte') AS threebyte,
                 rolling_hash('$fourByte') AS fourbyte""").head
    assert(got.getLong(0) == 94422542L, "composed cafe-acute must fold its 2-byte sequence")
    assert(got.getLong(1) == 927009668L, "decomposed e+combining-acute folds different bytes")
    assert(got.getLong(0) != got.getLong(1),
      "byte-identity, not codepoint-normalized identity: composed != decomposed")
    assert(got.getLong(2) == 366307755L, "3-byte sequences (euro + CJK)")
    assert(got.getLong(3) == 7307479L, "4-byte sequence (non-BMP emoji)")
  }

  test("vec_dot rejects non-array operands with a type error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT vec_dot(1.0, 2.0)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("array"))
  }

  test("hamming registers as SQL and counts byte differences + length gap") {
    graft.functions.GraftFunctions.register(spark)
    val got = spark.sql(
      """SELECT hamming('0101', '0101') AS eq,
                hamming('0101', '0001') AS one,
                hamming('0101', '1010') AS all4,
                hamming('0101', '01') AS lengap""").head
    assert((got.getInt(0), got.getInt(1), got.getInt(2), got.getInt(3)) == ((0, 1, 4, 2)))
  }

  test("hamming stays inside whole-stage codegen (no fallback)") {
    import org.apache.spark.sql.functions.col
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = graft.io.Tables.documents(spark, SparkTestSession.sfDir)
        .select(col("text"), col("lang"),
          graft.functions.TextExprs.hamming(col("text"), col("lang")).as("d"))
      // `*(n)` prefixes mark whole-stage-codegen'd operators
      assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
      df.collect().foreach { r =>
        val expected = graft.functions.HammingDistance.hammingUtf8(
          org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)),
          org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1)))
        assert(r.getInt(2) == expected)
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
