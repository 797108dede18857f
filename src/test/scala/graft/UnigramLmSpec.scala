package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.UnigramLm

class UnigramLmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def totalCost(model: UnigramLm.UnigramModel): Long = {
    val costMap = model.pieces.map(p => p.piece -> p.cost_micro).toMap
    model.segs
      .select(col("cnt"), col("piece")).collect()
      .map(r => r.getLong(0) * costMap(r.getString(1))).sum
  }

  test("save/load round-trips the model; duplicate pieces fail loudly") {
    val docs = Seq((1L, "banana bandana cabana banana")).toDF("doc_id", "text")
    val model = UnigramLm.train(docs, "text", vocabSize = 24)
    val path = java.nio.file.Files.createTempDirectory("graft-uni-model").toString
    UnigramLm.save(model, path)
    val loaded = UnigramLm.load(spark, path)
    // piece table round-trips as a set (load re-sorts; order is not part
    // of the model — the Viterbi cost map is keyed, not positional)
    assert(loaded.pieces.toSet == model.pieces.toSet)
    // the loaded pieces segment identically
    val costs = loaded.pieces.map(p => (p.piece, p.cost_micro)).toArray
    val origCosts = model.pieces.map(p => (p.piece, p.cost_micro)).toArray
    val words = Seq("banana", "cabana", "ban").toDF("word")
    def seg(cs: Array[(String, Long)]) = words
      .select(col("word"), UnigramLm.viterbiPieces(col("word"), cs, 4).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(seg(costs) == seg(origCosts))
    assert(loaded.segs.collect().map(_.toString).sorted.toSeq ==
      model.segs.collect().map(_.toString).sorted.toSeq)
    model.release(); loaded.release()
    // corruption detection: a double-written piece table must refuse
    spark.read.parquet(s"$path/pieces")
      .unionAll(spark.read.parquet(s"$path/pieces"))
      .write.mode("overwrite").parquet(s"$path-dup/pieces")
    val ex = intercept[IllegalArgumentException](UnigramLm.load(spark, s"$path-dup"))
    assert(ex.getMessage.contains("duplicate pieces"))
  }

  test("segmentation is lossless: pieces concatenate back to every word") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "the jay pig fox zebra and my wolves quack")).toDF("doc_id", "text")
    val model = UnigramLm.train(docs, "text", vocabSize = 40)
    val bad = model.segs
      .groupBy("word")
      .agg(concat_ws("", array_sort(collect_list(struct(col("pos"), col("piece"))))
        .getField("piece")).as("rebuilt"))
      .filter(col("rebuilt") =!= col("word"))
      .count()
    assert(bad == 0, "every word must be exactly the concat of its pieces")
    model.release()
  }

  test("training is deterministic and keeps every single character") {
    val docs = Seq(
      (1L, "banana bandana cabana"),
      (2L, "the banana and the bandana")).toDF("doc_id", "text")
    val m1 = UnigramLm.train(docs, "text", vocabSize = 32)
    val m2 = UnigramLm.train(docs, "text", vocabSize = 32)
    assert(m1.pieces == m2.pieces, "same corpus must induce the same model")
    val corpusChars = "bananabandanacabanatheand".toSet.map((c: Char) => c.toString)
    val vocabChars = m1.pieces.map(_.piece).filter(_.length == 1).toSet
    assert(corpusChars.subsetOf(vocabChars),
      s"single chars must never prune: missing ${corpusChars -- vocabChars}")
    m1.release(); m2.release()
  }

  test("Viterbi-EM does not increase the corpus segmentation cost") {
    // hard EM re-estimates costs from the chosen segmentation; under the
    // re-estimated model the total Viterbi cost of the corpus must not
    // grow (add-one smoothing + micro-nat rounding can wobble the last
    // digits, hence the 0.1% tolerance)
    val docs = Seq(
      (1L, "internationalization and localization considerations"),
      (2L, "the nation nationalized international rationalization"),
      (3L, "rational nationalism internationalism and nationality")).toDF("doc_id", "text")
    val m0 = UnigramLm.train(docs, "text", vocabSize = 48, emIters = 0)
    val m1 = UnigramLm.train(docs, "text", vocabSize = 48, emIters = 1)
    val m2 = UnigramLm.train(docs, "text", vocabSize = 48, emIters = 2)
    val (c0, c1, c2) = (totalCost(m0), totalCost(m1), totalCost(m2))
    assert(c1 <= c0 + c0 / 1000, s"EM round 1 must not worsen cost: $c0 -> $c1")
    assert(c2 <= c1 + c1 / 1000, s"EM round 2 must not worsen cost: $c1 -> $c2")
    m0.release(); m1.release(); m2.release()
  }

  test("ties prefer the longer piece; multi-char pieces actually win frequent strings") {
    val docs = Seq((1L,
      ("lowing " * 20) + ("low " * 10) + ("ing " * 10))).toDF("doc_id", "text")
    val model = UnigramLm.train(docs, "text", vocabSize = 24)
    // 'low' and 'ing' are frequent enough to earn cheap pieces; 'lowing'
    // must segment through them, not char-by-char
    val seg = model.segs.filter(col("word") === "lowing")
      .orderBy("pos").select("piece").as[String].collect().toSeq
    assert(seg.length < 6, s"frequent substrings must win over chars: $seg")
    model.release()
  }

  test("OOV characters at apply time stay lossless via the unk fallback") {
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val model = UnigramLm.train(docs, "text", vocabSize = 24)
    val costs = model.pieces.map(p => (p.piece, p.cost_micro)).toArray
    // 'qzx' shares no character with the training corpus
    val seg = Seq("qzxa").toDF("word")
      .select(UnigramLm.viterbiPieces(col("word"), costs, 4).as("pieces"))
      .select(concat_ws("", col("pieces")).as("w")).as[String].head()
    assert(seg == "qzxa", s"OOV segmentation must round-trip, got $seg")
    model.release()
  }

  test("train owns its intermediate pins; release drops the model pin") {
    val docs = Seq((1L, "pinned pins pin")).toDF("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.size
    val model = UnigramLm.train(docs, "text", vocabSize = 16)
    model.segs.count()
    model.release()
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after == before,
      s"pinned blocks leaked across train+release: $before -> $after")
  }

  test("seed-then-prune schedule: caps at the target, keeps chars, legacy path byte-stable") {
    val docs = Seq(
      (1L, "banana bandana cabana banana anagram salamander"),
      (2L, "panorama panama bananarama salamander anagram"),
      (3L, "abracadabra alakazam bandana panorama")).toDF("doc_id", "text")
    // defaults (seedSize = 0) must be byte-identical to the legacy
    // schedule — the declared oracle replays it constant-for-constant
    val legacy = UnigramLm.train(docs, "text", vocabSize = 24, emIters = 2)
    val explicit = UnigramLm.train(docs, "text", vocabSize = 24, emIters = 2,
      seedSize = 0)
    assert(legacy.pieces == explicit.pieces)
    legacy.release(); explicit.release()

    // pruning schedule: a 3x seed pool distills down to <= vocabSize,
    // all single chars survive, and segmentation stays lossless
    val pruned = UnigramLm.train(docs, "text", vocabSize = 24, emIters = 3,
      seedSize = 72)
    assert(pruned.pieces.length <= 24,
      s"pruning must land at the target, got ${pruned.pieces.length}")
    val chars = docs.select(explode(split(regexp_replace(
      lower(col("text")), "[^a-z]", ""), "")).as("c"))
      .filter(col("c") =!= "").distinct().as[String].collect().toSet
    assert(chars.subsetOf(pruned.pieces.map(_.piece).filter(_.length == 1).toSet),
      "every corpus character must survive the prune")
    val rejoined = pruned.segs
      .groupBy("word")
      .agg(concat_ws("", array_sort(collect_list(struct(col("pos"), col("piece"))))
        .getField("piece")).as("re"))
      .filter(col("word") =!= col("re")).count()
    assert(rejoined == 0, "pruned-vocab segmentation must stay lossless")
    // determinism of the full schedule
    val again = UnigramLm.train(docs, "text", vocabSize = 24, emIters = 3,
      seedSize = 72)
    assert(pruned.pieces == again.pieces)
    pruned.release(); again.release()
  }

  test("declared-query corpus respects the oracle's unrolled DP bound") {
    val maxLen = graft.io.Tables.documents(spark, SparkTestSession.sfDir)
      .select(explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)))
        .as("w"))
      .agg(max(length(col("w")))).head.getInt(0)
    assert(maxLen <= graft.queries.TextPipeline.UniMaxWordLen,
      s"corpus word length $maxLen exceeds the oracle DP bound " +
        s"${graft.queries.TextPipeline.UniMaxWordLen} — regenerate the oracle")
  }
}
