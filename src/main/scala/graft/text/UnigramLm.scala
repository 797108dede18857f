package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) subword tokenizer (Kudo, ACL 2018:
  * "Subword Regularization") — the second standard LLM tokenizer family
  * next to [[Bpe]], trained by Viterbi hard-EM:
  *
  *  - SEED: every substring (length ≤ `maxPieceLen`) of the corpus's
  *    distinct words, weighted by word frequency; the vocabulary keeps
  *    ALL single characters (losslessness) plus the top multi-character
  *    pieces by (count DESC, piece ASC) up to `vocabSize`. Piece cost is
  *    the negative log relative frequency in INTEGER MICRO-NATS
  *    (`round(−ln(p)·10⁶)`), so the Viterbi DP is integer-exact and
  *    engine-portable — the DuckDB oracle replays the identical DP over
  *    identical costs and cannot drift on float summation order.
  *  - E-STEP: each distinct word is segmented by Viterbi under the
  *    current costs (min total cost; ties prefer the LONGER piece, which
  *    is total — equal cost + equal length + equal end ⇒ same piece).
  *  - M-STEP: piece usage (Σ word-count over the chosen segmentations)
  *    re-estimates costs with add-one smoothing; unused multi-character
  *    pieces prune, single characters always survive.
  *
  * Scale shape (the k-means-centers pattern): the distinct-word table
  * stays DISTRIBUTED (word diversity grows with the corpus); the
  * vocabulary is BOUNDED DRIVER STATE (≤ `vocabSize` rows, like k
  * centroids), shipped into the per-row Viterbi as a plan reference
  * object. Each EM pass is one codegen projection + one explode + one
  * partial-aggregated piece rollup + one vocab-bounded collect — no
  * per-word driver loop, no UDF, no quadratic join. Contrast the
  * reference engine's single-process tokenizers: this trains on a corpus
  * that does not fit one machine because only piece STATISTICS ever
  * leave the executors.
  *
  * Representation note: this trainer is ALREADY on the one-row-per-word
  * form that [[WordPiece.train]]'s batched path later adopted (the
  * 12.8× round-14 win) — the Viterbi kernel reads the word STRING
  * directly off the distinct-word table, so no EM round ever pays a
  * (word, pos) window sort; the exploded (word, cnt, pos, piece) form
  * exists only in the FINAL segmentation artifact the model contract
  * pins. The 100× soak (`unigram_train`, BASELINE.md: 6.91 s → 12.4 s
  * for 100× corpus, 1.8× time) reflects that shape; there is no
  * window-merge loop here to port away.
  */
object UnigramLm {

  /** One vocabulary entry of a trained model: integer micro-nat cost and
    * the word-frequency-weighted usage under the final segmentation.
    */
  final case class Piece(piece: String, cost_micro: Long, usage: Long)

  /** A trained model: the (≤ vocabSize) piece table, the final
    * segmentation of the TRAINING vocabulary — (word, cnt, pos, piece),
    * localCheckpoint-pinned — and its release handle ([[Bpe.BpeModel]]'s
    * contract).
    */
  final case class UnigramModel(pieces: Seq[Piece], segs: DataFrame,
                                release: () => Unit)

  /** Persist a trained model: the piece table (the portable tokenizer —
    * [[viterbiPieces]] needs nothing else) plus the training-vocabulary
    * segmentation, both parquet (overwrite) — the [[Bpe.save]] contract
    * for the unigram family.
    */
  def save(model: UnigramModel, path: String): Unit = {
    val spark = model.segs.sparkSession
    import spark.implicits._
    model.pieces.toDF().coalesce(1)
      .write.mode("overwrite").parquet(s"$path/pieces")
    model.segs.write.mode("overwrite").parquet(s"$path/segs")
  }

  /** Load a persisted model: pieces re-collected (asserted non-empty
    * and unique — a truncated or double-written table fails loudly),
    * segmentation served straight from parquet (nothing pinned,
    * `release()` is a no-op).
    */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): UnigramModel = {
    import spark.implicits._
    val pieces = spark.read.parquet(s"$path/pieces").as[Piece]
      .collect().sortBy(p => (p.cost_micro, p.piece)).toSeq
    require(pieces.nonEmpty, s"no unigram pieces at $path/pieces")
    require(pieces.map(_.piece).distinct.length == pieces.length,
      s"duplicate pieces at $path — corrupted or double-written model")
    UnigramModel(pieces, spark.read.parquet(s"$path/segs"), () => ())
  }

  /** Sentinel cost for characters never seen at train time: the apply
    * path stays lossless on OOV alphabets (each unknown char becomes its
    * own piece). Never triggers when applying to the training corpus —
    * the seed keeps every single character — so the (train-corpus) oracle
    * replay needs no unk handling.
    */
  val UnkCostMicro: Long = math.round(-math.log(1e-9) * 1e6)

  /** Train on the corpus's letter-run words ([[Bpe.words]] pre-tokenizer:
    * `[a-z]+` runs of the lowercased text). `emIters` EM rounds, then one
    * final E-pass that produces the served segmentation and usage.
    *
    * `seedSize > vocabSize` switches on the SentencePiece PRUNING
    * SCHEDULE (Kudo §3.2): seed with `seedSize` multi-character
    * candidates and shrink per EM round — keep the used pieces, cap
    * their count at `max(target, ⌈kept·shrink⌉)` by (usage DESC, piece
    * ASC), with the LAST round capped at the target exactly — so the
    * final vocabulary is distilled from a candidate pool rather than
    * frozen at seed time (what production-vocab quality needs: a piece
    * that only looks good before its competitors are priced can still
    * be displaced). The default `seedSize = 0` keeps the legacy
    * seed-at-final-size path BYTE-STABLE — the declared oracle replays
    * that exact schedule. Per-round cost is unchanged in shape: one
    * codegen Viterbi pass + one piece rollup + one ≤seedSize collect;
    * only bounded driver state grows (seedSize rows, still k-centroid
    * posture).
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int = 48,
            maxPieceLen: Int = 4, emIters: Int = 2, seedSize: Int = 0,
            shrink: Double = 0.75): UnigramModel = {
    val wordsDf = Bpe.words(docs, textCol).localCheckpoint(true)
    try {
      // ---- seed: substring counts over the distinct-word table --------
      // checkpointed: the char and multi-piece collects below both read it
      val cands = wordsDf
        .select(col("word"), col("cnt"),
          explode(sequence(lit(1), length(col("word")))).as("start"))
        .select(col("word"), col("cnt"), col("start"),
          explode(sequence(lit(1),
            least(lit(maxPieceLen), length(col("word")) - col("start") + 1)))
            .as("l"))
        .select(col("word").substr(col("start"), col("l")).as("piece"), col("cnt"))
        .groupBy("piece")
        .agg(sum("cnt").as("pcnt"))
        .localCheckpoint(true)
      // alphabet-bounded + vocab-bounded collects: the piece table IS the
      // model (driver state by design, like k centroids)
      val (chars, seed) = try {
        val chars = cands.filter(length(col("piece")) === 1)
          .orderBy(asc("piece"))
          .collect().map(r => (r.getString(0), r.getLong(1)))
        val multi = cands.filter(length(col("piece")) > 1)
          .orderBy(desc("pcnt"), asc("piece"))
          .limit(math.max(math.max(seedSize, vocabSize) - chars.length, 0))
          .collect().map(r => (r.getString(0), r.getLong(1)))
        (chars, chars ++ multi)
      } finally graft.util.Pins.release(cands)
      val seedTot = seed.map(_._2).sum.toDouble
      var costs: Array[(String, Long)] = seed.map { case (p, c) =>
        (p, math.round(-math.log(c / seedTot) * 1e6))
      }

      // ---- EM: segment (distributed) / re-estimate (driver) -----------
      def usageUnder(cs: Array[(String, Long)]): Map[String, Long] =
        wordsDf
          .select(col("cnt"),
            explode(viterbiPieces(col("word"), cs, maxPieceLen)).as("piece"))
          .groupBy("piece").agg(sum("cnt").as("usage"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

      val multiTarget = math.max(vocabSize - chars.length, 0)
      for (round <- 1 to emIters) {
        val usage = usageUnder(costs)
        var kept = costs.filter { case (p, _) =>
          usage.getOrElse(p, 0L) > 0L || p.length == 1
        }
        if (seedSize > vocabSize) { // pruning schedule (see scaladoc)
          val (cs, multi) = kept.partition(_._1.length == 1)
          val cap =
            if (round == emIters) multiTarget
            else math.max(multiTarget, math.ceil(multi.length * shrink).toInt)
          kept = cs ++ multi
            .sortBy { case (p, _) => (-usage.getOrElse(p, 0L), p) }
            .take(cap)
        }
        val tot = kept.map { case (p, _) => usage.getOrElse(p, 0L) + 1L }.sum.toDouble
        costs = kept.map { case (p, _) =>
          (p, math.round(-math.log((usage.getOrElse(p, 0L) + 1L) / tot) * 1e6))
        }
      }

      // ---- final E-pass: served segmentation + reported usage ---------
      // ONE Viterbi pass: the segmentation table is checkpointed first
      // and the usage rollup reads the checkpoint (recomputing the
      // projection for usage would double the most expensive pass)
      val segs = wordsDf
        .select(col("word"), col("cnt"),
          posexplode(viterbiPieces(col("word"), costs, maxPieceLen))
            .as(Seq("pos", "piece")))
        .localCheckpoint(true)
      val finalUsage = segs
        .groupBy("piece").agg(sum("cnt").as("usage"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val pieces = costs.map { case (p, c) =>
        Piece(p, c, finalUsage.getOrElse(p, 0L))
      }.toSeq
      UnigramModel(pieces, segs, () => graft.util.Pins.release(segs))
    } finally graft.util.Pins.release(wordsDf)
  }

  /** Column API: Viterbi segmentation of a word column under a fixed
    * piece-cost table — `array<string>` of pieces, in order.
    */
  def viterbiPieces(word: Column, costs: Array[(String, Long)],
                    maxPieceLen: Int): Column =
    ColumnBridge.column(
      UnigramViterbi(ColumnBridge.expression(word), costs, maxPieceLen))

  /** The per-word DP the generated code calls: `best(j) = min over piece
    * lengths l of best(j−l) + cost(word[j−l..j])`, ties to the larger l
    * (strict `<` with l descending). Integer costs — exact.
    */
  def viterbi(s: String, costs: java.util.HashMap[String, java.lang.Long],
              maxPieceLen: Int): ArrayData = {
    val L = s.length
    if (L == 0) return new GenericArrayData(Array.empty[Any])
    val INF = java.lang.Long.MAX_VALUE / 4
    val best = new Array[Long](L + 1)
    val bl = new Array[Int](L + 1)
    var j = 1
    while (j <= L) {
      best(j) = INF
      bl(j) = 0
      var l = math.min(maxPieceLen, j)
      while (l >= 1) {
        if (best(j - l) < INF) {
          val c = costs.get(s.substring(j - l, j))
          if (c != null) {
            val cand = best(j - l) + c.longValue()
            if (cand < best(j)) { best(j) = cand; bl(j) = l }
          }
        }
        l -= 1
      }
      if (bl(j) == 0) { // OOV char: its own piece (lossless fallback)
        best(j) = (if (best(j - 1) < INF) best(j - 1) else 0L) + UnkCostMicro
        bl(j) = 1
      }
      j += 1
    }
    var n = 0
    var p = L
    while (p > 0) { n += 1; p -= bl(p) }
    val out = new Array[Any](n)
    p = L
    var i = n - 1
    while (p > 0) {
      out(i) = UTF8String.fromString(s.substring(p - bl(p), p))
      i -= 1
      p -= bl(p)
    }
    new GenericArrayData(out)
  }
}

/** Codegen Viterbi segmentation over a string column: the piece-cost
  * table rides as a plan reference object (a `HashMap` probe per
  * (position, length) — O(L·maxPieceLen) per row), inside whole-stage
  * codegen. See [[UnigramLm]] for the DP contract.
  */
case class UnigramViterbi(child: Expression, costs: Array[(String, Long)],
                          maxPieceLen: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_viterbi"

  @transient private lazy val costMap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](costs.length * 2)
    costs.foreach { case (p, c) => m.put(p, java.lang.Long.valueOf(c)) }
    m
  }

  override def nullSafeEval(w: Any): Any =
    UnigramLm.viterbi(w.asInstanceOf[UTF8String].toString, costMap, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val mRef = ctx.addReferenceObj("unigramCosts", costMap, "java.util.HashMap")
      s"${ev.value} = graft.text.UnigramLm.viterbi($c.toString(), $mRef, $maxPieceLen);"
    })

  override protected def withNewChildInternal(newChild: Expression): UnigramViterbi =
    copy(child = newChild)
}
