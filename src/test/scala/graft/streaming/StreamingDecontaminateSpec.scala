package graft.streaming

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Streaming decontamination: per-batch flagging against the static
  * benchmark set, restart continuity, and idempotent batch replay.
  */
class StreamingDecontaminateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val benchText = "the capital of france is paris and everyone knows it"
  private val leakText = "trivia time the capital of france is paris said the quiz"
  private val cleanText = "unrelated text about distributed query engines and shuffles"

  private def writeBatch(dir: Path, rows: Seq[(Long, String)]): Unit =
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(dir.toString)

  private def runOnce(inDir: Path, flagged: Path, ckpt: Path): Unit = {
    val docs = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(inDir.toString)
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val q = StreamingDecontaminate.run(docs, bench, "doc_id", "text",
      flagged.toString, ckpt.toString)
    q.awaitTermination()
  }

  private def flaggedSet(flagged: Path): Set[(Long, Long)] =
    StreamingDecontaminate.readFlagged(spark, flagged.toString)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hits"))).toSet

  test("leaking docs are flagged per batch, clean docs pass, restarts append") {
    val base = Files.createTempDirectory("graft-streamdecon")
    val (in, flagged, ckpt) =
      (base.resolve("in"), base.resolve("flagged"), base.resolve("ckpt"))
    Files.createDirectories(in)

    writeBatch(in, Seq((1L, leakText), (2L, cleanText)))
    runOnce(in, flagged, ckpt)
    val after1 = flaggedSet(flagged)
    assert(after1.map(_._1) == Set(1L), s"only the leaking doc flags: $after1")
    assert(after1.head._2 == 4L, "the 4 shared 3-gram shingles counted")

    // stream stopped; new file arrives; restart from the checkpoint —
    // the new batch is checked against the SAME static benchmark
    writeBatch(in, Seq((3L, cleanText), (4L, "of france is")))
    runOnce(in, flagged, ckpt)
    val after2 = flaggedSet(flagged)
    assert(after2 == Set((1L, 4L), (4L, 1L)),
      s"restart flags the new leak, never the clean docs: $after2")
  }

  test("empty serving matches the non-empty schema, including a non-default idCol") {
    val base = Files.createTempDirectory("graft-streamdecon-schema")
    val flagged = base.resolve("flagged")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val benchShingles = graft.dedup.Dedup.shingles(bench, "doc_id", "text", 3)
      .select("shingle").distinct()
    // a NON-default id column, declared only at the stream
    val batch = Seq(("u-1", leakText)).toDF("uri", "text")
    StreamingDecontaminate.processBatch(batch, 0L, benchShingles,
      "uri", "text", flagged.toString, 3)
    val nonEmpty = StreamingDecontaminate.readFlagged(spark, flagged.toString)
    // torn store: the _schema stamp survives, the data does not (first
    // batch crashed before any footer committed) — exactly the window
    // where the old default-parameter empty frame served a WRONG column
    // name and no batch column
    val fs = CompactionSwap.fsFor(flagged.toString,
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$flagged/batch=0"), true)
    val empty = StreamingDecontaminate.readFlagged(spark, flagged.toString)
    assert(empty.isEmpty)
    assert(empty.schema.map(f => (f.name, f.dataType)) ==
      nonEmpty.schema.map(f => (f.name, f.dataType)),
      s"empty ${empty.schema} must be typed like non-empty ${nonEmpty.schema}")
    // callers can select the declared id column AND the batch column on
    // the empty path (the round-17 review's exact failure)
    assert(empty.select("uri", "n_hits", "batch").count() == 0)
  }

  test("replaying a batch id overwrites its own output (idempotent)") {
    val base = Files.createTempDirectory("graft-streamdecon-replay")
    val flagged = base.resolve("flagged")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val benchShingles = graft.dedup.Dedup.shingles(bench, "doc_id", "text", 3)
      .select("shingle").distinct()
    val batch = Seq((1L, leakText)).toDF("doc_id", "text")
    StreamingDecontaminate.processBatch(batch, 0L, benchShingles,
      "doc_id", "text", flagged.toString, 3)
    StreamingDecontaminate.processBatch(batch, 0L, benchShingles,
      "doc_id", "text", flagged.toString, 3) // replay
    assert(flaggedSet(flagged) == Set((1L, 4L)), "replay must not duplicate rows")
  }
}
