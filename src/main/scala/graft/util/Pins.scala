package graft.util

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Actually release a `localCheckpoint` pin.
  *
  * `Dataset.unpersist()` routes through the CacheManager and only drops
  * entries registered by `cache()`/`persist()`. A `localCheckpoint` pins
  * its data one level lower — an RDD-level persist on the checkpointed
  * RDD, which the CacheManager never sees — so calling `unpersist()` on
  * a checkpointed Dataset is silently a no-op: the blocks stay pinned
  * until GC plus the ContextCleaner happen to collect the unreferenced
  * RDD (verified empirically; the BpeSpec pin-growth test fails under
  * plain unpersist). That nondeterminism is unacceptable for the
  * iterative loops (Lloyd, connected components, BPE) and long-lived
  * services (streaming dedup, model serving) that rely on
  * checkpoint-then-release to bound executor storage, so every
  * checkpoint release in the engine routes through here.
  */
object Pins {

  /** Drop the RDD pin behind a `localCheckpoint`'d Dataset, immediately
    * and deterministically; falls back to plain `unpersist()` for plans
    * that aren't checkpoint scans (cached plans, uncached no-ops).
    */
  def release(ds: Dataset[_]): Unit = ds.queryExecution.analyzed match {
    case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
    case _              => ds.unpersist(); ()
  }
}
