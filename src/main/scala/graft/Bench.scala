package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every declared query on
  * `SPARK_GRAFT_SF_DIR` and emits machine-readable JSON.
  *
  * Each query is materialized through the noop sink so the full plan —
  * every column, no count-only pruning — executes end to end. Failures
  * are reported as negative times rather than silently folded into the
  * total.
  *
  * Emission contract (the driver captures a bounded tail of stdout, so
  * a single 2+ KB JSON line can get truncated mid-line and parse to
  * nothing):
  *  1. the FULL result JSON is written to `BENCH_FULL.json` in the
  *     working directory,
  *  2. the full line is printed first,
  *  3. a compact line (same schema; slowest queries first, capped at
  *     ~1.5 KB so it always survives a 2 KB tail window together with
  *     sbt's trailing status line) is printed LAST.
  *
  * A warm-up pass runs every query shape once before timing (skippable
  * via SPARK_GRAFT_WARMUP=0): JIT + codegen compilation, parquet footer
  * reads, and the build-once shared materializations (LSH signature
  * index, IVF index) all land outside the timed region, as they would
  * in a long-lived service.
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

    // Optional comma-separated filter for single-query iteration.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .toSeq.sortBy(_._1)

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val flaky = scala.collection.mutable.LinkedHashMap.empty[String, String]

    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                quiet: Boolean): (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val failure =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          if (!quiet) System.err.println(s"[bench] $name failed: $msg")
          Some(msg.linesIterator.take(1).mkString.take(200))
        }
      val secs = (System.nanoTime() - t0) / 1e9
      (if (failure.isEmpty) secs else -secs, failure)
    }

    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0")
      selected.foreach { case (name, fn) => runOnce(name, fn, quiet = true) }

    // Best-of-N timing (default 2): one contention window on a shared
    // machine otherwise shows up as a phantom 5-10x regression on
    // whichever queries were in flight (rounds 7 and 8 each had one).
    // min-of-reps is the standard steady-state estimator here — the
    // true cost plus the smallest noise draw.
    //
    // A query lands in "errors" only when EVERY timed rep failed (so
    // n_errors means "queries with no successful run", the reading the
    // parity check assumes); a query that failed some reps but succeeded
    // another keeps its best-of time and is tagged in "flaky" instead —
    // one artifact entry per query, never both signals at once.
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt)
    val results = selected.map { case (name, fn) =>
      val runs = (1 to reps).map(_ => runOnce(name, fn, quiet = false))
      val good = runs.map(_._1).filter(_ > 0)
      val firstMsg = runs.flatMap(_._2).headOption
      if (good.isEmpty) firstMsg.foreach(m => errors(name) = m)
      else firstMsg.foreach(m => flaky(name) = m)
      name -> (if (good.nonEmpty) good.min else runs.head._1)
    }

    def entries(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v > 0 => v }.sum
    // Failures carry their message, not just a bare negative time — a
    // vanished query must name itself in the artifact (round-8 lesson).
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString(""","errors":{""", ",", "}") +
      flaky.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
        .mkString(""","flaky":{""", ",", "}")
    def wrap(qs: String, extra: String): String =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs$extra,"sf":"$sfDir"}"""

    val fullJson = wrap(entries(results), errJson)
    // a SPARK_GRAFT_ONLY-filtered run must not clobber the full-suite
    // artifact SKILL.md's regression procedure diffs against
    if (only.isEmpty)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_FULL.json"), fullJson + "\n")
    println(fullJson)

    // Compact line: slowest-first per-query entries under a byte budget,
    // so the line that reaches a bounded tail capture is complete JSON.
    val budget = 1500
    val desc = results.sortBy { case (_, v) => -math.abs(v) }
    val kept = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    var used = 120 // wrapper + extras allowance
    desc.foreach { case (k, v) =>
      val cost = k.length + 12
      if (used + cost <= budget) { kept += ((k, v)); used += cost }
    }
    val extra = s""","n_queries":${results.size},"queries_omitted":${results.size - kept.size},"n_errors":${errors.size},"n_flaky":${flaky.size},"full":"BENCH_FULL.json""""
    println(wrap(entries(kept.toSeq), extra))
    spark.stop()
  }
}
