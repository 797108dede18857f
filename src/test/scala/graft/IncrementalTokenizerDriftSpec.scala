package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.IncrementalTokenizerDrift
import graft.text.WordPiece

/** Tokenizer drift monitor: batch-parity stats, crash-replay
  * idempotence, the drift verdict's trigger edges, and graceful
  * empty-store serving.
  */
class IncrementalTokenizerDriftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // a tiny frozen vocab: full alphabet for "the cat sat" words + two
  // merged pieces; words with chars outside a-z..-ish (e.g. 'x', 'q')
  // go [UNK]
  private val vocab = Seq("t", "h", "e", "c", "a", "s", "th", "at")

  private def writeDocs(dir: Path, rows: Seq[(Long, String)]): Unit =
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(dir.toString)

  private def runOnce(in: Path, store: Path, ckpt: Path): Unit = {
    val docs = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(in.toString)
    IncrementalTokenizerDrift.run(docs, "text", vocab,
      store.toString, ckpt.toString).awaitTermination()
  }

  private def stats(store: Path): Map[Long, (Long, Long, Long)] =
    IncrementalTokenizerDrift.readStats(spark, store.toString)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("per-batch stats: word/unk/piece counts match hand-tokenization") {
    val base = Files.createTempDirectory("graft-tokdrift")
    val (in, store, ckpt) =
      (base.resolve("in"), base.resolve("store"), base.resolve("ckpt"))
    Files.createDirectories(in)
    // "the cat sat": the→[th,e] 2 pieces, cat→[c,at] 2, sat→[s,at] 2
    // "tax": 'x' not in vocab → whole word [UNK]
    writeDocs(in, Seq((1L, "the cat sat"), (2L, "tax the")))
    runOnce(in, store, ckpt)
    val m = stats(store)
    assert(m.size == 1)
    val (w, u, p) = m.values.head
    assert(w == 5L, s"words: $w")          // the cat sat tax the
    assert(u == 1L, s"unk: $u")            // tax
    assert(p == 1L + 2L * 4, s"pieces: $p") // 4 tokenizable words x 2 + UNK
    val st = IncrementalTokenizerDrift.readStats(spark, store.toString)
      .collect().head
    assert(math.abs(st.getAs[Double]("oov_rate") - 0.2) < 1e-12)
    assert(math.abs(st.getAs[Double]("fertility") - 2.0) < 1e-12)
  }

  test("streaming run maintains the store across restarts — one row per microbatch") {
    val base = Files.createTempDirectory("graft-tokdrift-stream")
    val (in, store, ckpt) =
      (base.resolve("in"), base.resolve("store"), base.resolve("ckpt"))
    Files.createDirectories(in)
    writeDocs(in, Seq((1L, "the cat sat"), (2L, "tax the")))
    runOnce(in, store, ckpt)
    assert(stats(store).size == 1)
    assert(stats(store).values.head == ((5L, 1L, 9L)))
    // stream stopped; a late file arrives; the restart processes ONLY it
    writeDocs(in, Seq((3L, "cat cat")))
    runOnce(in, store, ckpt)
    val m = stats(store)
    assert(m.size == 2, s"restart must add exactly one batch: $m")
    assert(m.values.toSet.contains((2L, 0L, 4L)), s"late batch stats: $m")
  }

  test("crash-replayed batch overwrites its own output — never double-counts") {
    val base = Files.createTempDirectory("graft-tokdrift-replay")
    val store = base.resolve("store")
    val batch = Seq((1L, "the cat")).toDF("doc_id", "text")
    IncrementalTokenizerDrift.processBatch(batch, 7L, "text", vocab, store.toString)
    val once = stats(store)
    IncrementalTokenizerDrift.processBatch(batch, 7L, "text", vocab, store.toString)
    assert(stats(store) == once, "replay must be idempotent")
    assert(once(7L)._1 == 2L)
  }

  test("drift verdict: OOV surge pages, in-distribution batch does not") {
    val base = Files.createTempDirectory("graft-tokdrift-verdict")
    val store = base.resolve("store")
    def b(id: Long, text: String) = IncrementalTokenizerDrift.processBatch(
      Seq((id, text)).toDF("doc_id", "text"), id, "text", vocab, store.toString)
    b(0L, "the cat sat the cat sat the cat sat the") // baseline: 0 OOV
    b(1L, "the cat sat that")                        // in-dist (that→th,at ok)
    val calm = IncrementalTokenizerDrift.drift(spark, store.toString)
      .collect().head
    assert(!calm.getAs[Boolean]("drifted"), s"calm batch paged: $calm")
    b(2L, "zzz qqq xxx www the")                     // 80% OOV surge
    val paged = IncrementalTokenizerDrift.drift(spark, store.toString)
      .collect().head
    assert(paged.getAs[Boolean]("drifted"), s"surge not paged: $paged")
    assert(paged.getAs[Double]("latest_oov") > 0.7)
    assert(paged.getAs[Double]("baseline_oov") == 0.0)
  }

  test("drift verdict: fertility creep pages without any OOV") {
    val base = Files.createTempDirectory("graft-tokdrift-fert")
    val store = base.resolve("store")
    def b(id: Long, text: String) = IncrementalTokenizerDrift.processBatch(
      Seq((id, text)).toDF("doc_id", "text"), id, "text", vocab, store.toString)
    // baseline: merged pieces cover everything at fertility 2
    b(0L, "the cat sat the cat sat")
    // later: words that only tokenize char-by-char (fertility 4), 0 OOV
    b(1L, "shhs shhs caca ttee")
    val v = IncrementalTokenizerDrift.drift(spark, store.toString)
      .collect().head
    assert(v.getAs[Double]("latest_oov") == 0.0)
    assert(v.getAs[Boolean]("drifted"), s"fertility creep not paged: $v")
    assert(v.getAs[Double]("latest_fertility") >
      1.5 * v.getAs[Double]("baseline_fertility"))
  }

  test("empty and baseline-only stores serve gracefully — no throw, no verdict") {
    val base = Files.createTempDirectory("graft-tokdrift-empty")
    val store = base.resolve("store")
    assert(IncrementalTokenizerDrift.readStats(spark, store.toString).count() == 0)
    assert(IncrementalTokenizerDrift.drift(spark, store.toString).count() == 0)
    IncrementalTokenizerDrift.processBatch(
      Seq((1L, "the cat")).toDF("doc_id", "text"), 0L, "text", vocab,
      store.toString)
    // one batch = still inside the baseline window: no verdict row yet
    assert(IncrementalTokenizerDrift.drift(spark, store.toString).count() == 0)
  }

  test("a torn first write (store dir with no committed footers) serves empty, not a throw") {
    val base = Files.createTempDirectory("graft-tokdrift-torn")
    val store = base.resolve("store")
    // simulate the crash window: the batch dir exists but only holds the
    // uncommitted _temporary staging — no parquet footer to infer from
    Files.createDirectories(store.resolve("batch=0").resolve("_temporary"))
    assert(IncrementalTokenizerDrift.readStats(spark, store.toString).count() == 0)
    assert(IncrementalTokenizerDrift.drift(spark, store.toString).count() == 0)
  }

  test("one typo in a small batch does not page against a zero-OOV baseline") {
    val base = Files.createTempDirectory("graft-tokdrift-typo")
    val store = base.resolve("store")
    def b(id: Long, text: String) = IncrementalTokenizerDrift.processBatch(
      Seq((id, text)).toDF("doc_id", "text"), id, "text", vocab, store.toString)
    b(0L, "the cat sat the cat sat the cat")   // baseline: 0 OOV
    b(1L, "the cat sat the cat sat the catx")  // ONE unknown word (catx)
    val v = IncrementalTokenizerDrift.drift(spark, store.toString).collect().head
    assert(v.getAs[Double]("latest_oov") > 0.0)
    assert(!v.getAs[Boolean]("drifted"), s"one typo must not page: $v")
    // two unknown words at a surged rate DO page
    b(2L, "catx qixy the")
    val paged = IncrementalTokenizerDrift.drift(spark, store.toString)
      .collect().head
    assert(paged.getAs[Boolean]("drifted"), s"two unks at 2/3 rate must page: $paged")
  }

  test("the full lifecycle: drift pages -> retrain on the shifted mix -> publish heals OOV") {
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft-tokdrift-lifecycle")
    val (store, modelDir) = (base.resolve("store"), base.resolve("model"))
    val oldCorpus = Seq((1L, "the cat sat the cat sat")).toDF("doc_id", "text")
    val newCorpus = Seq((2L, "zorb zorb qixy zorb the")).toDF("doc_id", "text")
    val v0 = WordPiece.train(oldCorpus, "text", 2)
    WordPiece.publish(v0, modelDir.toString, spark)
    // monitor with the PUBLISHED model: baseline clean, shifted batch pages
    def monitor(id: Long, docs: org.apache.spark.sql.DataFrame): Unit =
      IncrementalTokenizerDrift.processBatch(docs, id, "text",
        WordPiece.load(spark, modelDir.toString).pieces, store.toString)
    monitor(0L, oldCorpus)
    monitor(1L, newCorpus)
    val paged = IncrementalTokenizerDrift.drift(spark, store.toString)
      .collect().head
    assert(paged.getAs[Boolean]("drifted"), s"shifted batch must page: $paged")
    // the operator's move: retrain on the shifted mix, publish atomically
    val v1 = WordPiece.train(oldCorpus.union(newCorpus), "text", 2)
    WordPiece.publish(v1, modelDir.toString, spark)
    // a reader mid-rotation always sees a COMPLETE model
    assert(WordPiece.load(spark, modelDir.toString).merges == v1.merges)
    // re-monitoring the same shifted batch with the new vocab: OOV heals
    val healedStore = base.resolve("store2")
    IncrementalTokenizerDrift.processBatch(newCorpus, 0L, "text",
      WordPiece.load(spark, modelDir.toString).pieces, healedStore.toString)
    val healed = IncrementalTokenizerDrift.readStats(spark, healedStore.toString)
      .collect().head
    assert(healed.getAs[Double]("oov_rate") == 0.0, s"retrain must heal: $healed")
  }

  test("monitors a REAL trained model over the real corpus: near-zero OOV on in-corpus text") {
    val d = SparkTestSession.sfDir
    val docs = graft.io.Tables.documents(spark, d)
    val model = WordPiece.train(docs, "text", 4)
    val base = Files.createTempDirectory("graft-tokdrift-real")
    val store = base.resolve("store")
    IncrementalTokenizerDrift.processBatch(docs, 0L, "text", model.pieces,
      store.toString)
    val st = IncrementalTokenizerDrift.readStats(spark, store.toString)
      .collect().head
    // the training corpus itself can never be OOV (alphabet-complete)
    assert(st.getAs[Double]("oov_rate") == 0.0)
    assert(st.getAs[Double]("fertility") >= 1.0)
  }
}
