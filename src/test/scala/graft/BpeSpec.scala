package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Bpe

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def segment(word: String, merges: Seq[Bpe.Merge]): Seq[String] = {
    val seg = Bpe.segmentWords(Seq(word).toDF("word"), merges)
    val out = seg.orderBy("pos").select("sym").as[String].collect().toSeq
    graft.util.Pins.release(seg)
    out
  }

  private def m(rank: Int, a: String, b: String): Bpe.Merge =
    Bpe.Merge(rank, a, b, a + b, 0L)

  test("greedy-leftmost overlap: self-pair merges take offsets 0,2,4 of a run") {
    assert(segment("aaaa", Seq(m(1, "a", "a"))) == Seq("aa", "aa"))
    assert(segment("aaa", Seq(m(1, "a", "a"))) == Seq("aa", "a"))
    assert(segment("aaaaa", Seq(m(1, "a", "a"))) == Seq("aa", "aa", "a"))
    // non-overlapping pair: every occurrence merges in one pass
    assert(segment("ababab", Seq(m(1, "a", "b"))) == Seq("ab", "ab", "ab"))
  }

  test("merges stack in rank order over prior merge outputs") {
    val merges = Seq(m(1, "a", "b"), m(2, "ab", "ab"))
    assert(segment("abab", merges) == Seq("abab"))
    assert(segment("ababab", merges) == Seq("abab", "ab"))
    // rank order matters: (b,a) before (a,b) segments differently
    assert(segment("aba", Seq(m(1, "b", "a"), m(2, "a", "b"))) == Seq("a", "ba"))
  }

  test("train is deterministic and pair counts are non-increasing in rank") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the rat sat on the cat"),
      (3L, "that hat is the cat hat")).toDF("doc_id", "text")
    val m1 = Bpe.train(docs, "text", 6)
    val m2 = Bpe.train(docs, "text", 6)
    assert(m1.merges == m2.merges, "same corpus must induce the same table")
    // each rank's winning count bounds the next (a merge can only create
    // pairs at most as frequent as the pair it fused)
    val counts = m1.merges.map(_.pair_count)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"counts not non-increasing: $counts")
    // "at" appears in cat/sat/mat/rat/that/hat — must be the first merge
    assert((m1.merges.head.lhs, m1.merges.head.rhs) == ("a", "t"))
    m1.release(); m2.release()
  }

  test("apply . train round-trips: vocab segmentations concatenate back to the word") {
    val docs = Seq(
      (1L, "banana bandana cabana"),
      (2L, "the banana and the bandana")).toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", 5)
    val bad = model.vocabSyms
      .groupBy("word")
      .agg(concat_ws("", array_sort(collect_list(struct(col("pos"), col("sym"))))
        .getField("sym")).as("rebuilt"))
      .filter(col("rebuilt") =!= col("word"))
      .count()
    assert(bad == 0, "every word must be exactly the concat of its subwords")
    model.release()
  }

  test("save/load round-trips the model; a truncated merge list fails loudly") {
    val docs = Seq(
      (1L, "banana bandana cabana"),
      (2L, "the banana and the bandana")).toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", 5)
    val path = java.nio.file.Files.createTempDirectory("graft-bpe-model").toString
    Bpe.save(model, path)
    val loaded = Bpe.load(spark, path)
    assert(loaded.merges == model.merges, "merge list must round-trip exactly")
    // the loaded model tokenizes identically (merges are the tokenizer)
    val corpus = Seq((9L, "a banana cabana")).toDF("doc_id", "text")
    def toks(ms: Seq[Bpe.Merge]): Seq[(Long, Int, Int, String)] = {
      val tc = Bpe.tokenize(corpus, "doc_id", "text", ms)
      val out = tc.tokens.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
        .toSeq.sorted
      tc.release(); out
    }
    assert(toks(loaded.merges) == toks(model.merges))
    // vocab table round-trips (as a set — parquet has no row order)
    assert(loaded.vocabSyms.collect().map(_.toString).sorted.toSeq ==
      model.vocabSyms.collect().map(_.toString).sorted.toSeq)
    model.release(); loaded.release()
    // truncation detection: drop rank 1, the load must refuse
    import spark.implicits._
    spark.read.parquet(s"$path/merges")
      .filter(col("merge_rank") =!= 1)
      .write.mode("overwrite").parquet(s"$path-trunc/merges")
    val ex = intercept[IllegalArgumentException](Bpe.load(spark, s"$path-trunc"))
    assert(ex.getMessage.contains("not contiguous"))
  }

  test("tokenize handles OOV words via the merge list alone") {
    val train = Seq((1L, "lower lowest newer newest")).toDF("doc_id", "text")
    val model = Bpe.train(train, "text", 4)
    // 'wider' shares no word with training but its letters do
    val tc = Bpe.tokenize(Seq((9L, "wider lower")).toDF("doc_id", "text"),
      "doc_id", "text", model.merges)
    val byWord = tc.tokens.orderBy("widx", "pos")
      .groupBy("widx").agg(concat_ws("", collect_list("token")).as("w"))
      .orderBy("widx").select("w").as[String].collect().toSeq
    assert(byWord == Seq("wider", "lower"),
      s"tokenization must cover OOV words losslessly, got $byWord")
    tc.release(); model.release()
  }

  test("tokenize owns and releases its segmentation pin: no pinned-block growth") {
    val docs = Seq((1L, "lower lowest newer newest")).toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", 4)
    val before = spark.sparkContext.getPersistentRDDs.size
    (0 until 4).foreach { _ =>
      val tc = Bpe.tokenize(docs, "doc_id", "text", model.merges)
      tc.tokens.count()
      tc.release()
    }
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after == before,
      s"pinned blocks grew across tokenize calls: $before -> $after")
    model.release()
  }

  test("exhausted corpora stop early with fewer ranks, never loop") {
    // single-char words only: no adjacent pairs exist at all
    val docs = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", 8)
    assert(model.merges.isEmpty)
    model.release()
  }

  test("batched training equals sequential when passes are conflict-free") {
    // 2-letter words: each merge completes its word, so no pass creates a
    // super-pair and the top pairs are symbol-disjoint — the batch path
    // must reproduce the sequential table exactly (ranks and counts)
    val docs = Seq(
      (1L, "ab ab ab ab ab ab ab ab cd cd cd cd cd cd ef ef ef ef"))
      .toDF("doc_id", "text")
    val seqModel = Bpe.train(docs, "text", 3)
    val batModel = Bpe.train(docs, "text", 3, batchSize = 3)
    assert(batModel.merges == seqModel.merges,
      s"conflict-free batches must match sequential:\n" +
        s"seq: ${seqModel.merges}\nbat: ${batModel.merges}")
    seqModel.release(); batModel.release()
  }

  test("batched displacement is exactly the documented one-pass deferral") {
    // 'abc' x8, 'de' x6: pairs (a,b):8, (b,c):8, (d,e):6.
    // Sequential: (a,b):8, then the created (ab,c):8 wins rank 2, (d,e):6
    // is rank 3. Batch=2: (b,c) conflicts with (a,b), so the pass takes
    // (a,b) and (d,e); (ab,c) surfaces next pass — same merge SET, the
    // super-pair displaced by one pass, every recorded count exact.
    val docs = Seq(
      (1L, "abc abc abc abc abc abc abc abc de de de de de de"))
      .toDF("doc_id", "text")
    val seqModel = Bpe.train(docs, "text", 3)
    val batModel = Bpe.train(docs, "text", 3, batchSize = 2)
    assert(seqModel.merges.map(m => (m.lhs, m.rhs, m.pair_count)) ==
      Seq(("a", "b", 8L), ("ab", "c", 8L), ("d", "e", 6L)))
    assert(batModel.merges.map(m => (m.lhs, m.rhs, m.pair_count)) ==
      Seq(("a", "b", 8L), ("d", "e", 6L), ("ab", "c", 8L)))
    assert(seqModel.merges.map(m => (m.lhs, m.rhs)).toSet ==
      batModel.merges.map(m => (m.lhs, m.rhs)).toSet,
      "displacement must never change the merge set")
    seqModel.release(); batModel.release()
  }

  test("batched simultaneous pass keeps greedy-leftmost per merge and round-trips") {
    // self-pair runs + a disjoint pair in the same batch: the run-parity
    // selection must stay per-merge correct when applied simultaneously
    val docs = Seq(
      (1L, "aaaa aaaa aaaa bc bc bc aaaa bc aaa"),
      (2L, "bc aaaa aaa bc")).toDF("doc_id", "text")
    val batModel = Bpe.train(docs, "text", 4, batchSize = 4)
    val bad = batModel.vocabSyms
      .groupBy("word")
      .agg(concat_ws("", array_sort(collect_list(struct(col("pos"), col("sym"))))
        .getField("sym")).as("rebuilt"))
      .filter(col("rebuilt") =!= col("word"))
      .count()
    assert(bad == 0, "batched passes must keep symbol tables lossless")
    // the (a,a) self-pair merged greedy-leftmost: 'aaaa' -> aa|aa,
    // 'aaa' -> aa|a in the training vocab
    val aaaa = batModel.vocabSyms.filter(col("word") === "aaaa")
      .orderBy("pos").select("sym").as[String].collect().toSeq
    val aaa = batModel.vocabSyms.filter(col("word") === "aaa")
      .orderBy("pos").select("sym").as[String].collect().toSeq
    assert(aaaa.headOption.contains("aa") || aaaa == Seq("aaaa"),
      s"unexpected aaaa segmentation $aaaa")
    assert(aaa.take(1) == Seq("aa") || aaa == Seq("aaa"),
      s"unexpected aaa segmentation $aaa")
    batModel.release()
  }

  test("large batched vocab: ranks per pass stay disjoint and counts exact per pass") {
    val docs = Seq(
      (1L, "the cat sat on the mat and the rat sat on the flat mat"),
      (2L, "that hat is the cat hat that the bat had"),
      (3L, "splendid wordforms multiply the merge frontier considerably"))
      .toDF("doc_id", "text")
    val batModel = Bpe.train(docs, "text", 24, batchSize = 6)
    assert(batModel.merges.size > 6, "expected multiple passes")
    // ranks are 1..n dense
    assert(batModel.merges.map(_.merge_rank) == (1 to batModel.merges.size))
    // within each pass (6 consecutive ranks) counts are non-increasing
    // and symbols disjoint — the batching contract
    batModel.merges.grouped(6).foreach { pass =>
      val counts = pass.map(_.pair_count)
      assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
        s"counts within a pass must be non-increasing: $pass")
      // self-pairs carry one symbol; disjointness is ACROSS pairs
      val symSets = pass.map(p => Set(p.lhs, p.rhs))
      for (i <- symSets.indices; j <- i + 1 until symSets.size)
        assert((symSets(i) & symSets(j)).isEmpty,
          s"symbols across a pass's pairs must be disjoint: $pass")
    }
    batModel.release()
  }
}
