package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.WordPieceSplit

/** Relational WordPiece vocabulary induction and application (Schuster &
  * Nakajima, "Japanese and Korean Voice Search", ICASSP 2012 — the BERT
  * tokenizer family, Devlin et al. 2019) — the third tokenizer family
  * next to [[Bpe]] (frequency-scored merges) and [[UnigramLm]]
  * (likelihood-pruned pieces):
  *
  *  - TRAIN is [[Bpe]]'s bounded driver loop over the DISTINCT-WORD
  *    symbol table with ONE change: the per-iteration argmax picks the
  *    adjacent pair maximizing the LIKELIHOOD GAIN score
  *    `count(ab) / (count(a) · count(b))` instead of the raw pair count —
  *    the merge that most increases corpus likelihood under a unigram
  *    symbol model (the canonical WordPiece criterion). Scores compare in
  *    integer micro-nats (`round((ln pc − ln ca − ln cb) · 10⁶)`), the
  *    [[UnigramLm]] precedent that keeps the DuckDB oracle's float math
  *    bit-agreeing with the JVM's; ties break score DESC → lhs ASC →
  *    rhs ASC. Merge mechanics (greedy-leftmost run-parity pass,
  *    symbol-disjoint batching) are [[Bpe]]'s, shared code.
  *  - APPLY is NOT a merge replay: WordPiece segments by greedy
  *    longest-match-first over the learned vocabulary
  *    ([[graft.functions.WordPieceKernels]], a codegen expression with
  *    the vocab as a plan reference object), the rule every BERT-family
  *    tokenizer ships. Unknown characters make the whole word `[UNK]`.
  *    Segmentation runs on the distinct-word table and joins back onto
  *    the exploded corpus — corpus touched once, vocab-sized work.
  *
  * Scale shape: identical to [[Bpe]] — the loop's cost is vocabulary-
  * bound (sublinear in corpus rows), per-pass state is one pinned
  * vocab-sized table, and `batchSize` > 1 amortizes driver round-trips
  * for production vocabularies exactly as [[Bpe.train]] does (the
  * symbol-disjointness argument is score-agnostic: it is about merge
  * mechanics, not ranking).
  */
object WordPiece {

  /** One learned merge: at `merge_rank`, (`lhs`, `rhs`) fuse into
    * `merged`; `score_micro` is the winning likelihood score in integer
    * micro-nats, `pair_count` its weighted corpus frequency.
    */
  final case class WpMerge(merge_rank: Int, lhs: String, rhs: String,
                           merged: String, score_micro: Long, pair_count: Long)

  /** A trained model: the merge list plus the training alphabet (every
    * single character seen — the greedy matcher's fallback floor). The
    * apply vocabulary is their union; both are driver-side and
    * vocab-bounded, nothing stays pinned.
    */
  final case class WpModel(merges: Seq[WpMerge], alphabet: Seq[String]) {
    /** Greedy-match vocabulary: alphabet ∪ merged pieces (distinct —
      * two different merge paths can produce the same string).
      */
    def pieces: Seq[String] = (alphabet ++ merges.map(_.merged)).distinct
  }

  private def w = Window.partitionBy("word").orderBy("pos")

  /** All adjacent pairs of the current symbol table with their
    * likelihood scores: (lhs, rhs, pc, score_micro). Symbol counts join
    * in by broadcast (symbol-alphabet-sized). The symbol-count table is
    * PINNED for the pass — the two broadcast joins would otherwise each
    * replay its aggregation over the full symbol table (one extra job
    * per pass × thousands of passes at production vocab); the caller
    * releases via the returned handle after collecting the argmax.
    */
  private def scoredPairs(syms: DataFrame): (DataFrame, () => Unit) = {
    val symCounts = syms.groupBy(col("sym")).agg(sum("cnt").as("c"))
      .localCheckpoint(true)
    val scored = syms
      .withColumn("__nxt", lead("sym", 1).over(w))
      .filter(col("__nxt").isNotNull)
      .groupBy(col("sym").as("lhs"), col("__nxt").as("rhs"))
      .agg(sum("cnt").as("pc"))
      .join(broadcast(symCounts.select(col("sym").as("lhs"), col("c").as("__ca"))), "lhs")
      .join(broadcast(symCounts.select(col("sym").as("rhs"), col("c").as("__cb"))), "rhs")
      // ln pc − ln ca − ln cb in micro-nats: EXACTLY the oracle's
      // ln(CAST(pc AS DOUBLE)) − ln(ca) − ln(cb) evaluation order
      .withColumn("score_micro",
        round((log(col("pc").cast("double")) - log(col("__ca").cast("double"))
          - log(col("__cb").cast("double"))) * lit(1000000.0)).cast("long"))
      .select("lhs", "rhs", "pc", "score_micro")
    (scored, () => graft.util.Pins.release(symCounts))
  }

  private def bestScored(syms: DataFrame): Option[(String, String, Long, Long)] = {
    val (scored, release) = scoredPairs(syms)
    try scored
      .orderBy(desc("score_micro"), asc("lhs"), asc("rhs"))
      .limit(1)
      .collect()
      .headOption
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    finally release()
  }

  /** Top `batchSize` SYMBOL-DISJOINT pairs by (score DESC, lhs, rhs) —
    * [[Bpe]]'s batching with the WordPiece ranking; the same 6×
    * oversample, the same greedy conflict scan.
    */
  private def bestScoredBatch(syms: DataFrame,
                              batchSize: Int): Seq[(String, String, Long, Long)] = {
    val (scored, release) = scoredPairs(syms)
    // 24x oversample (vs Bpe's 6x — a wider collect costs a few KB).
    // MEASURED caveat: the likelihood ranking CLUSTERS its head on
    // shared rare symbols (every pair touching the rarest symbol scores
    // high together), so batch fill is conflict-limited, not
    // truncation-limited — the 32k-rank demo fills ~17 of 256 per pass
    // at 6x and 24x alike. WordPiece batching is therefore a ~15x pass
    // cut over sequential, not BPE's ~250x; the criterion itself caps
    // it (each accepted merge invalidates the rest of the rare-symbol
    // head), which is why the production demo runs ~1800 passes
    val cand = try scored
      .orderBy(desc("score_micro"), asc("lhs"), asc("rhs"))
      .limit(math.max(batchSize * 24, 8))
      .collect()
    finally release()
    val used = scala.collection.mutable.HashSet.empty[String]
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long, Long)]
    val it = cand.iterator
    while (it.hasNext && out.size < batchSize) {
      val r = it.next()
      val (a, b) = (r.getString(0), r.getString(1))
      if (!used(a) && !used(b)) {
        out += ((a, b, r.getLong(2), r.getLong(3)))
        used += a; used += b
      }
    }
    out.toSeq
  }

  /** Induce (at most) `numMerges` WordPiece merges. Driver state:
    * `numMerges` merge rows + the alphabet. Early-stops when no adjacent
    * pair remains. `batchSize` > 1 applies symbol-disjoint batches per
    * pass — [[Bpe.train]]'s contract (ranks can displace by at most one
    * pass vs sequential; recorded scores/counts stay exact).
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            batchSize: Int = 1): WpModel = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    var syms = Bpe.initialSymbols(Bpe.words(docs, textCol)).localCheckpoint(true)
    val alphabet = syms.select("sym").distinct().orderBy("sym")
      .collect().map(_.getString(0)).toSeq
    val merges = scala.collection.mutable.ArrayBuffer.empty[WpMerge]
    var rank = 0
    var passes = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      passes += 1
      if (batchSize == 1) {
        bestScored(syms) match {
          case Some((a, b, pc, sm)) =>
            merges += WpMerge(rank + 1, a, b, a + b, sm, pc)
            val next = Bpe.mergePass(syms, a, b).localCheckpoint(true)
            graft.util.Pins.release(syms)
            syms = next
            rank += 1
          case None => exhausted = true
        }
      } else {
        val batch = bestScoredBatch(syms, math.min(batchSize, numMerges - rank))
        if (batch.isEmpty) exhausted = true
        else {
          batch.zipWithIndex.foreach { case ((a, b, pc, sm), i) =>
            merges += WpMerge(rank + 1 + i, a, b, a + b, sm, pc)
          }
          val next = Bpe.multiMergePass(syms, batch.map(t => (t._1, t._2)))
            .localCheckpoint(true)
          graft.util.Pins.release(syms)
          syms = next
          rank += batch.size
        }
      }
    }
    graft.util.Pins.release(syms)
    if (batchSize > 1)
      System.err.println(
        s"[wordpiece] ${merges.size} merges in $passes passes " +
          s"(batch $batchSize, mean fill ${merges.size / math.max(1, passes)})")
    WpModel(merges.toSeq, alphabet)
  }

  /** Greedy-segment a word list: (word, pieces array<string>) with `##`
    * continuation marks. One codegen projection over the distinct words
    * — no loop, no join; the vocabulary rides the plan.
    */
  def segmentWords(wordList: DataFrame, model: WpModel,
                   mark: Boolean = true): DataFrame =
    wordList.select("word").distinct()
      .withColumn("pieces", WordPieceSplit.split(col("word"), model.pieces, mark))

  /** Tokenize a corpus: segment its DISTINCT words (one codegen pass),
    * join back onto the exploded corpus. One row per subword:
    * (idCol, widx, pos, token). The seg side is distinct-word-sized;
    * the join is left to AQE (usually broadcast).
    */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
               model: WpModel): DataFrame = {
    val docWords = docs.select(col(idCol),
      posexplode(regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0)))
        .as(Seq("widx", "word")))
    val seg = segmentWords(docWords.select("word"), model)
      .select(col("word"), posexplode(col("pieces")).as(Seq("pos", "token")))
    docWords.join(seg, "word")
      .select(col(idCol), col("widx"), col("pos"), col("token"))
  }

  /** Persist a model: merges + alphabet as parquet (overwrite) — the
    * serve-many artifact, [[Bpe.save]]'s contract.
    */
  def save(model: WpModel, path: String, spark: SparkSession): Unit = {
    import spark.implicits._
    model.merges.toDF().coalesce(1)
      .write.mode("overwrite").parquet(s"$path/merges")
    model.alphabet.toDF("sym").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/alphabet")
  }

  /** Crash-safe model publish: [[save]]'s two-directory overwrite is not
    * atomic (a crash between the merges and alphabet writes leaves a
    * torn model that [[load]] can only reject, not repair), so a LIVE
    * model dir — one a serving pipeline reads while the drift monitor
    * ([[graft.streaming.IncrementalTokenizerDrift]]) decides to retrain
    * — is replaced through the shared
    * [[graft.streaming.CompactionSwap.swap]] protocol instead: write
    * the full model to a tmp dir, then swap it into place with the
    * crash-recoverable rename pair (a reader sees the old model or the
    * new one, never a torn mix; a crash mid-swap rolls forward/back on
    * the next publish). First publish (no existing dir) is a single
    * tmp-write + rename.
    */
  def publish(model: WpModel, modelDir: String, spark: SparkSession): Unit = {
    import graft.streaming.CompactionSwap
    import org.apache.hadoop.fs.Path
    val fs = CompactionSwap.fsFor(modelDir,
      spark.sparkContext.hadoopConfiguration)
    val swapped = CompactionSwap.swap(fs, modelDir)(tmp => save(model, tmp, spark))
    if (!swapped) {
      // first publish: stage fully, then one rename into place
      val tmp = new Path(modelDir + ".publishing")
      fs.delete(tmp, true)
      save(model, tmp.toString, spark)
      if (!fs.rename(tmp, new Path(modelDir)))
        throw new java.io.IOException(
          s"model publish failed: $tmp -> $modelDir")
    }
  }

  /** Load a persisted model; merge ranks are asserted contiguous from 1
    * and the alphabet non-empty (truncated or partially overwritten
    * artifacts fail loudly — [[Bpe.load]]'s contract).
    */
  def load(spark: SparkSession, path: String): WpModel = {
    import spark.implicits._
    val merges = spark.read.parquet(s"$path/merges").as[WpMerge]
      .collect().sortBy(_.merge_rank).toSeq
    require(merges.nonEmpty, s"no WordPiece merges at $path/merges")
    require(merges.map(_.merge_rank) == (1 to merges.length),
      s"WordPiece merge list at $path is not contiguous from rank 1 — " +
        "truncated or partially overwritten model")
    val alphabet = spark.read.parquet(s"$path/alphabet")
      .orderBy("sym").collect().map(_.getString(0)).toSeq
    require(alphabet.nonEmpty, s"empty WordPiece alphabet at $path/alphabet")
    WpModel(merges, alphabet)
  }
}
