package graft

import java.nio.file.{Files, Path}
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.IncrementalCardinality

/** Incremental HLL cardinality store: stream maintenance, restart
  * accumulation, crash-replay idempotence, and estimate-preserving
  * compaction. At these cardinalities the lgK=14 sketch is
  * hash-set-exact, so estimates are asserted as equalities.
  */
class IncrementalCardinalitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def writeBatch(dir: Path, rows: Seq[(Long, Timestamp)]): Unit =
    rows.toDF("user_id", "ts").coalesce(1)
      .write.mode("append").parquet(dir.toString)

  private def runOnce(in: Path, store: Path, ckpt: Path): Unit = {
    val ev = spark.readStream.schema("user_id LONG, ts TIMESTAMP")
      .parquet(in.toString)
    IncrementalCardinality.run(ev, "user_id", "ts",
      store.toString, ckpt.toString).awaitTermination()
  }

  private def daily(store: Path): Map[Timestamp, Long] =
    IncrementalCardinality.readDailyEstimates(spark, store.toString)
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap

  test("per-day estimates accumulate across a stream restart; total dedups across days") {
    val base = Files.createTempDirectory("graft-inccard")
    val (in, store, ckpt) =
      (base.resolve("in"), base.resolve("store"), base.resolve("ckpt"))
    Files.createDirectories(in)

    // day 1: users 1..3; day 2: users 3..5 (overlap 3)
    writeBatch(in, Seq(
      (1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 11:00:00")),
      (3L, ts("2024-01-01 12:00:00")),
      (3L, ts("2024-01-02 09:00:00")), (4L, ts("2024-01-02 10:00:00")),
      (5L, ts("2024-01-02 11:00:00"))))
    runOnce(in, store, ckpt)
    assert(daily(store) == Map(
      ts("2024-01-01 00:00:00") -> 3L, ts("2024-01-02 00:00:00") -> 3L))
    assert(IncrementalCardinality.readTotalEstimate(spark, store.toString) == 5L)

    // stream stopped; a late file adds day-1 users (one repeat, one new)
    // and a fresh day 3 — the restarted stream merges, never rescans
    writeBatch(in, Seq(
      (1L, ts("2024-01-01 23:00:00")), (6L, ts("2024-01-01 23:30:00")),
      (7L, ts("2024-01-03 08:00:00"))))
    runOnce(in, store, ckpt)
    assert(daily(store) == Map(
      ts("2024-01-01 00:00:00") -> 4L, ts("2024-01-02 00:00:00") -> 3L,
      ts("2024-01-03 00:00:00") -> 1L))
    assert(IncrementalCardinality.readTotalEstimate(spark, store.toString) == 7L)
  }

  test("a crash-replayed batch overwrites itself: estimates unchanged") {
    val base = Files.createTempDirectory("graft-inccard-replay")
    val store = base.resolve("store").toString
    val batch = Seq((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 11:00:00")))
      .toDF("user_id", "ts")
    IncrementalCardinality.processBatch(batch, 0L, "user_id", "ts", store, 14)
    IncrementalCardinality.processBatch(batch, 0L, "user_id", "ts", store, 14)
    assert(IncrementalCardinality.readTotalEstimate(spark, store) == 2L)
  }

  test("compaction folds batches to one row per day without changing estimates") {
    val base = Files.createTempDirectory("graft-inccard-compact")
    val store = base.resolve("store").toString
    // three batches touching the same two days
    Seq(
      (0L, Seq((1L, "2024-01-01 10:00:00"), (2L, "2024-01-02 10:00:00"))),
      (1L, Seq((3L, "2024-01-01 11:00:00"), (2L, "2024-01-02 11:00:00"))),
      (2L, Seq((4L, "2024-01-02 12:00:00")))
    ).foreach { case (id, rows) =>
      IncrementalCardinality.processBatch(
        rows.map { case (u, t) => (u, ts(t)) }.toDF("user_id", "ts"),
        id, "user_id", "ts", store, 14)
    }
    val before = IncrementalCardinality.readDailyEstimates(spark, store)
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    IncrementalCardinality.compactStore(spark, store)
    val after = IncrementalCardinality.readDailyEstimates(spark, store)
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(after == before, s"compaction changed estimates: $before -> $after")
    // exactly one physical row per day now
    assert(spark.read.parquet(store).count() == 2L)
    // day 1 = {1,3}, day 2 = {2,4} (user 2 arrived twice, deduped)
    assert(before == Map(
      ts("2024-01-01 00:00:00") -> 2L, ts("2024-01-02 00:00:00") -> 2L))
  }

  test("rolling DAU/WAU/MAU from the store matches the batch ev_active_users shape") {
    val base = Files.createTempDirectory("graft-inccard-active")
    val store = base.resolve("store").toString
    // the real events table, replayed through the store in 3 microbatches
    // split by event hash — arbitrary batch boundaries, same totals
    val events = graft.io.Tables.events(spark, SparkTestSession.sfDir)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("event_id"))
    (0 until 3).foreach { b =>
      IncrementalCardinality.processBatch(
        events.filter(org.apache.spark.sql.functions
          .pmod(org.apache.spark.sql.functions.col("event_id"),
            org.apache.spark.sql.functions.lit(3)) === b),
        b.toLong, "user_id", "ts", store, 14)
    }
    def served: Map[java.sql.Date, (Long, Long, Long)] = {
      val df = IncrementalCardinality.readActiveUsers(spark, store)
      val m = df.collect()
        .map(r => r.getDate(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      graft.util.Pins.release(df)
      m
    }
    val batchDf = graft.queries.Relational.activeUsers(events)
    val expected = batchDf.collect()
      .map(r => r.getDate(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    graft.util.Pins.release(batchDf)
    val fromStore = served
    // lgK=14 is hash-set-exact at this scale: full per-day equality, the
    // suite's standard (not just the 5% window)
    assert(fromStore == expected,
      s"served active-users diverged from batch: ${fromStore.toSeq.sortBy(_._1.toString).take(3)} vs ${expected.toSeq.sortBy(_._1.toString).take(3)}")
    // compaction must preserve every window estimate
    IncrementalCardinality.compactStore(spark, store)
    assert(served == expected, "compaction changed the served windows")
  }

  test("readers serve gracefully before the first batch and on a torn store") {
    // the readTopK contract: a dashboard polling before the stream's
    // first commit (or during a torn first write) gets zeros/empties,
    // not PATH_NOT_FOUND / UNABLE_TO_INFER_SCHEMA mid-incident
    val base = Files.createTempDirectory("graft-inccard-empty")
    val missing = base.resolve("store").toString
    assert(IncrementalCardinality.readDailyEstimates(spark, missing).count() == 0L)
    assert(IncrementalCardinality.readTotalEstimate(spark, missing) == 0L)
    assert(IncrementalCardinality.readActiveUsers(spark, missing).count() == 0L)
    // torn: dir exists, no committed footers
    val torn = base.resolve("torn")
    Files.createDirectories(torn.resolve("batch=0").resolve("_temporary"))
    assert(IncrementalCardinality.readDailyEstimates(spark, torn.toString).count() == 0L)
    assert(IncrementalCardinality.readTotalEstimate(spark, torn.toString) == 0L)
    assert(IncrementalCardinality.readActiveUsers(spark, torn.toString).count() == 0L)
  }
}
