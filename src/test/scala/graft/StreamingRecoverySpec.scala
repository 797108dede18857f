package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Tables

/** Checkpoint restart recovery + exactly-once file sink: the stream is
  * stopped and restarted between input arrivals with the same checkpoint,
  * and each input file is reflected in the sink exactly once — including
  * an idle restart that must process nothing. This is the durability
  * contract a 100 TB ingest pipeline leans on (source offsets + sink
  * manifest both transact through the checkpoint).
  */
class StreamingRecoverySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def stage(from: Path, into: Path): Unit =
    Files.list(from).filter(_.toString.endsWith(".parquet")).forEach { f =>
      Files.copy(f, into.resolve(f.getFileName))
    }

  test("restarted AvailableNow stream resumes from the checkpoint exactly once") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-recovery")
    val (inDir, ckpt, sink) = (base.resolve("in"), base.resolve("ckpt"), base.resolve("sink"))
    Files.createDirectories(inDir)

    // two halves of the events table, long-typed ts (stable stream schema)
    val ev = Tables.events(spark, SparkTestSession.sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
    val halfA = base.resolve("halfA"); val halfB = base.resolve("halfB")
    ev.filter(pmod(col("event_id"), lit(2)) === 0).coalesce(1)
      .write.parquet(halfA.toString)
    ev.filter(pmod(col("event_id"), lit(2)) === 1).coalesce(1)
      .write.parquet(halfB.toString)

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE, ts_us LONG")
        .parquet(inDir.toString)
        .filter(col("event_type") =!= "view")
        .select("event_id", "user_id", "value")
        .writeStream
        .format("parquet")
        .option("path", sink.toString)
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def sinkIds(): Seq[Long] =
      spark.read.parquet(sink.toString).select("event_id").as[Long].collect().toSeq

    val expectedA = ev.filter(pmod(col("event_id"), lit(2)) === 0 &&
      col("event_type") =!= "view").select("event_id").as[Long].collect().sorted
    val expectedAll = ev.filter(col("event_type") =!= "view")
      .select("event_id").as[Long].collect().sorted

    // 1st run: only half A staged
    stage(halfA, inDir)
    runOnce()
    val after1 = sinkIds()
    assert(after1.sorted.toSeq == expectedA.toSeq, "first run = exactly half A")

    // 2nd run, same checkpoint: half B arrives; A must not be reprocessed
    stage(halfB, inDir)
    runOnce()
    val after2 = sinkIds()
    assert(after2.length == after2.distinct.length, "no duplicates after restart")
    assert(after2.sorted.toSeq == expectedAll.toSeq, "second run adds exactly half B")

    // 3rd run, nothing new: the sink must be byte-stable
    runOnce()
    assert(sinkIds().sorted.toSeq == expectedAll.toSeq, "idle restart processes nothing")
  }

  test("foreachBatch upsert log: latest row per key survives restarts and re-reads") {
    import graft.streaming.EventsStream
    val base = Files.createTempDirectory("graft-upsert")
    val (inDir, ckpt, target) = (base.resolve("in"), base.resolve("ckpt"), base.resolve("tgt"))
    Files.createDirectories(inDir)

    // `ver` is a composite (ts, event_id) struct: a TOTAL version order,
    // so max_by is deterministic even when a user has two events at the
    // same timestamp
    val ev = Tables.events(spark, SparkTestSession.sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("ver", struct(col("ts_us"), col("event_id")))
    val halfA = base.resolve("halfA"); val halfB = base.resolve("halfB")
    ev.filter(pmod(col("event_id"), lit(2)) === 0).coalesce(1).write.parquet(halfA.toString)
    ev.filter(pmod(col("event_id"), lit(2)) === 1).coalesce(1).write.parquet(halfB.toString)

    def runOnce(): Unit = {
      val streamed = spark.readStream
        .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE, " +
          "ts_us LONG, ver STRUCT<ts_us: LONG, event_id: LONG>")
        .parquet(inDir.toString)
      val q = EventsStream.upsertToParquetLog(streamed, "user_id", "ver",
        target.toString, ckpt.toString)
      q.awaitTermination()
    }

    stage(halfA, inDir); runOnce()
    stage(halfB, inDir); runOnce()

    // latest event per user over the full input == upsert-log resolution
    val expected = EventsStream.readUpserted(spark,
      { val d = base.resolve("all"); ev.coalesce(1).write.parquet(d.toString); d.toString },
      "user_id", "ver")
    val got = EventsStream.readUpserted(spark, target.toString, "user_id", "ver")
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("user_id", "event_id", "ts_us").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(key(got) == key(expected))

    // compaction bounds the log without changing what readers see
    val logRowsBefore = spark.read.parquet(target.toString).count()
    EventsStream.compactUpsertLog(spark, target.toString, "user_id", "ver")
    val logRowsAfter = spark.read.parquet(target.toString).count()
    assert(logRowsAfter < logRowsBefore, "compaction did not shrink the log")
    assert(key(EventsStream.readUpserted(spark, target.toString, "user_id", "ver"))
      == key(expected), "compaction changed the resolved table")
  }
}
