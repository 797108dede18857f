package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every declared query on
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line.
  *
  * Each query is materialized through the noop sink so the full plan —
  * every column, no count-only pruning — executes end to end. Failures
  * are reported as negative times rather than silently folded into the
  * total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM + Spark warm-up (codegen, parquet footer reads) outside timing.
    SparkEntry.queries.get("a1_groupby_count")
      .foreach(fn => fn(spark, sfDir).write.format("noop").mode("overwrite").save())

    // Optional comma-separated filter for single-query iteration.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }

    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      val secs = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) secs else -secs)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v > 0 => v }.sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
