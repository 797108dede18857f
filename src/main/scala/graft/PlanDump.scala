package graft

import org.apache.spark.sql.SparkSession

/** Writes `explain("formatted")` for named declared queries to
  * `<outDir>/<query>_<suffix>.txt` — the optimization round's
  * before/after plan evidence (plans/r19/).
  *
  * {{{ sbt 'runMain graft.PlanDump /root/testdata/sf0.1 plans/r19 before dd_jaccard_pairs,...' }}}
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val names = args(3).split(",").toSeq
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "100000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Queries that eagerly checkpoint their result print a checkpoint
    // scan from their own explain (zero audit value — the PLANS.md
    // lazyOverrides problem). For those, dump the LAZY pipeline:
    // "after" uses the engine's *Lazy audit variants; "before" uses a
    // verbatim reconstruction of the round-18 pipeline (same operators
    // minus the eager checkpoints — diffable against commit ecda594).
    import org.apache.spark.sql.{DataFrame, functions => F}
    import org.apache.spark.sql.expressions.Window
    def r18CappedShingles(sh0: DataFrame, cap: Long): DataFrame =
      sh0.withColumn("__df",
          F.count(F.lit(1)).over(Window.partitionBy("shingle")))
        .filter(F.col("__df") <= cap)
        .drop("__df")
    def r18PairTail(hashed: DataFrame, scorer: String, threshold: Double): DataFrame = {
      val sizes = hashed.groupBy("doc_id").agg(F.count(F.lit(1)).as("set_size"))
      val a = hashed.select(F.col("doc_id").as("id_a"), F.col("__sh"))
      val b = hashed.select(F.col("doc_id").as("id_b"), F.col("__sh"))
      val inter = a.join(b, "__sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).as("inter_size"))
      val joined = inter
        .join(sizes.withColumnRenamed("doc_id", "id_a")
          .withColumnRenamed("set_size", "size_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b")
          .withColumnRenamed("set_size", "size_b"), "id_b")
      val scored =
        if (scorer == "jaccard")
          joined.withColumn("jaccard", F.col("inter_size") /
            (F.col("size_a") + F.col("size_b") - F.col("inter_size")))
        else
          joined.withColumn("containment",
            F.col("inter_size") / F.least(F.col("size_a"), F.col("size_b")))
      scored.filter(F.col(scorer) >= threshold).select("id_a", "id_b", scorer)
    }
    def shingleTbl = graft.queries.PipelineOps.shingleTable(spark, sfDir)
    def docs = graft.io.Tables.documents(spark, sfDir)
    val overrides: Map[String, () => DataFrame] = Map(
      "dd_jaccard_pairs@before" -> (() => r18PairTail(
        r18CappedShingles(shingleTbl, 50L)
          .select(F.col("doc_id"), F.xxhash64(F.col("shingle")).as("__sh")),
        "jaccard", 0.5)),
      "dd_containment_pairs@before" -> (() => r18PairTail(
        r18CappedShingles(shingleTbl, 50L)
          .select(F.col("doc_id"), F.xxhash64(F.col("shingle")).as("__sh")),
        "containment", 0.8)),
      "dd_cosine_pairs@before" -> (() => {
        val tf = docs
          .select(F.col("doc_id"),
            F.explode(graft.text.TextOps.tokens(F.col("text"))).as("term"))
          .groupBy(F.col("doc_id"), F.col("term")).agg(F.count(F.lit(1)).as("__tf"))
        val withDf = tf.withColumn("__df",
          F.count(F.lit(1)).over(Window.partitionBy("term")))
          .filter(F.col("__df") <= 50)
        val nDocs = docs.select(F.count(F.lit(1)).as("__n"))
        val wts = withDf.crossJoin(F.broadcast(nDocs))
          .select(F.col("doc_id"), F.xxhash64(F.col("term")).as("__t"),
            (F.col("__tf") * F.log(F.col("__n") / F.col("__df"))).as("__w"))
        val norms = wts.groupBy("doc_id")
          .agg(F.sqrt(F.sum(F.col("__w") * F.col("__w"))).as("__nrm"))
        val a = wts.select(F.col("doc_id").as("id_a"), F.col("__t"), F.col("__w").as("__wa"))
        val b = wts.select(F.col("doc_id").as("id_b"), F.col("__t"), F.col("__w").as("__wb"))
        a.join(b, "__t").filter(F.col("id_a") < F.col("id_b"))
          .groupBy("id_a", "id_b").agg(F.sum(F.col("__wa") * F.col("__wb")).as("__dp"))
          .join(norms.withColumnRenamed("doc_id", "id_a")
            .withColumnRenamed("__nrm", "__na"), "id_a")
          .join(norms.withColumnRenamed("doc_id", "id_b")
            .withColumnRenamed("__nrm", "__nb"), "id_b")
          .withColumn("cosine_sim", F.col("__dp") / (F.col("__na") * F.col("__nb")))
          .filter(F.col("cosine_sim") >= 0.3)
          .select("id_a", "id_b", "cosine_sim")
      }),
      "dd_jaccard_pairs@after" -> (() => graft.dedup.Dedup
        .jaccardPairsFromShinglesLazy(shingleTbl, "doc_id", 0.5, Some(50L))),
      "dd_containment_pairs@after" -> (() => graft.dedup.Dedup
        .containmentPairsFromShinglesLazy(shingleTbl, "doc_id", 0.8, Some(50L))),
      "dd_cosine_pairs@after" -> (() => graft.dedup.Dedup
        .cosinePairsLazy(docs, "doc_id", "text", 0.3, Some(50L))),
      "dd_repeated_spans@before" -> (() => graft.dedup.Dedup
        .repeatedSpansLazy(docs, "doc_id", "text", 8, r18DistinctFilter = true)),
      "dd_repeated_spans@after" -> (() => graft.dedup.Dedup
        .repeatedSpansLazy(docs, "doc_id", "text", 8)))

    names.foreach { name =>
      val df = overrides.get(s"$name@$suffix") match {
        case Some(b) => b()
        case None    => SparkEntry.queries(name)(spark, sfDir)
      }
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
        .replaceAll("0x[0-9A-Fa-f]{256,}", "0x…<binary literal elided>")
      java.nio.file.Files.writeString(
        outDir.resolve(s"${name}_$suffix.txt"), plan)
      println(s"[plandump] wrote ${name}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
