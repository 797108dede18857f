package graft

import org.apache.spark.sql.SparkSession

/** The library's front door: a SparkSession configured with the engine's
  * scale posture and extensions in one call.
  *
  *  - AQE on (runtime partition coalescing, broadcast demotion, skew-join
  *    splitting) — the configuration half of the 100 TB design (SURVEY §4).
  *  - `spark.sql.shuffle.partitions` sized to the session's parallelism
  *    instead of the 200 default (AQE coalesces down, but the cap should
  *    reflect the cluster).
  *  - Session timezone pinned to UTC so timestamp semantics match across
  *    engines and hosts.
  *  - Graft extensions injected: native SQL functions (`vec_dot`,
  *    `rolling_hash`, `hamming`), the HOF dot-product rewrite rule, and
  *    the broadcast as-of join strategy.
  *
  * On a real cluster, prefer
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` plus
  * site-specific sizing; this builder is the single-JVM equivalent.
  */
object GraftSession {

  def build(master: String = "local[*]",
            shufflePartitions: Option[Int] = None,
            appName: String = "graft"): SparkSession = {
    val parts = shufflePartitions.getOrElse(
      Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.session.timeZone", "UTC")
      // The bounded-heap typed aggregates (TopKBy, MmrSelect) keep at
      // most k tiny entries per group, so a large in-memory hash map is
      // exactly the safe case — but ObjectHashAggregate's default
      // fallback threshold (128 distinct keys per task!) silently
      // degrades them to SORT-BASED aggregation, turning the map-side
      // k-contraction into an external sort + spill-merge of the whole
      // candidate stream (caught by the round-17 sf1 gate: sim_ann_join
      // pinned 2 cores for >10 min in UnsafeSorterSpillMerger).
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "100000")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    // extensions don't apply to a pre-existing session from getOrCreate —
    // make registration idempotent either way
    graft.functions.GraftFunctions.register(spark)
    graft.operators.BroadcastAsofJoin.ensureRegistered(spark)
    spark
  }
}
