package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Tables
import graft.streaming.EventsStream

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** File-stream sources need a *directory*; stage the single parquet file
    * into a temp dir once.
    */
  lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${SparkTestSession.sfDir}/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("streaming tumbling agg over events equals the batch computation") {
    val streamed = EventsStream.tumblingAgg(EventsStream.readEvents(spark, eventsDir))
    // Complete mode flushes every window, so the set equals the batch query
    // (append mode would withhold windows past the final watermark).
    val got = EventsStream.runToMemory(spark, streamed, "tumbling_test", OutputMode.Complete())
      .select("w_start", "event_type", "n_events", "total_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val batch = Tables.events(spark, SparkTestSession.sfDir)
      .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
      .select(col("window.start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("session windows produce per-user sessions with positive spans") {
    val streamed = EventsStream.sessionAgg(EventsStream.readEvents(spark, eventsDir))
    val rows = EventsStream.runToMemory(spark, streamed, "session_test").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.getTimestamp(1).before(r.getTimestamp(0))) // end >= start
      assert(r.getLong(3) >= 1)                            // n_events
    }
  }
}
