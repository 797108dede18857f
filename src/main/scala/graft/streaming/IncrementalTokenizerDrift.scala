package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.WordPieceSplit

/** Tokenizer drift monitor: per-batch OOV and fertility statistics of a
  * FROZEN trained tokenizer over a continuously-ingesting document
  * stream — the tokenizer-lifecycle analogue of the ANN index's drift
  * metric ([[graft.similarity.Similarity]]'s `ivfDrift` /
  * [[IncrementalAnnIndex]]'s refit trigger): a vocabulary trained on
  * yesterday's corpus degrades as the distribution shifts (new domains,
  * scripts, jargon), and the first symptoms are a rising unknown-word
  * rate and rising fertility (pieces per tokenizable word) — the two
  * numbers every production tokenizer dashboard tracks, because both
  * directly inflate training cost and clip effective context.
  *
  * Per microbatch (`foreachBatch`): ONE aggregation of the batch's
  * letter-run words through the frozen vocabulary's greedy matcher (the
  * codegen [[graft.functions.WordPieceKernels]] expression — the vocab
  * rides the plan, the corpus is never collected) down to THREE LONGS
  * (n_words, n_unk_words, n_pieces), appended as an idempotent
  * `batch=<id>` subdirectory (overwrite mode — a crash-replayed batch
  * overwrites its own partial output instead of double-counting; the
  * [[IncrementalCardinality]] store layout).
  *
  * Serving folds the per-batch longs — integer sums, so the rates are
  * exact and engine/order-independent — and [[drift]] compares the
  * LATEST batch's rates against the baseline (the first
  * `baselineBatches` batches, normally fed from the tokenizer's own
  * training corpus). The monitor only signals; retraining and swapping
  * the vocabulary is the operator's move ([[graft.text.WordPiece
  * .publish]] — the same staged-swap protocol the ANN index's refit
  * uses).
  *
  * Unlike the sibling stores this one has NO compaction entry point,
  * deliberately: the store grows one three-long row per microbatch (a
  * year of minutely batches is half a million longs), and [[drift]]'s
  * baseline-window-vs-latest comparison NEEDS the per-batch
  * granularity a fold-to-one-row compaction would destroy.
  */
object IncrementalTokenizerDrift {

  /** Start the drift maintenance over a streaming documents frame.
    * `pieces` is the frozen vocabulary ([[graft.text.WordPiece.WpModel
    * .pieces]] — or any piece set the greedy matcher should serve).
    */
  def run(docs: DataFrame, textCol: String, pieces: Seq[String],
          storeDir: String, checkpointDir: String): StreamingQuery = {
    // no compaction here, but the checkpoint-identity guard still
    // applies: a fresh checkpoint would restart batch ids at 0 and
    // silently overwrite the per-batch history rows drift() compares
    BatchStore.bindCheckpoint(docs.sparkSession, checkpointDir, storeDir)
    docs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // per-batch identity re-check (see BatchStore.ensureBound)
        BatchStore.ensureBound(batch.sparkSession, checkpointDir, storeDir)
        processBatch(batch, batchId, textCol, pieces, storeDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** One microbatch: the batch's words through the frozen matcher, down
    * to three longs. An UNK word contributes one piece (the whole-word
    * `[UNK]` token) to n_pieces and is EXCLUDED from fertility's
    * denominator at serve time — fertility measures how finely the
    * vocab splits the words it can tokenize, OOV measures what it
    * cannot. Factored out of the stream for direct unit testing.
    */
  def processBatch(batch: Dataset[Row], batchId: Long, textCol: String,
                   pieces: Seq[String], storeDir: String): Unit = {
    val stats = batch.toDF()
      .select(explode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z]+"), lit(0))).as("word"))
      .select(WordPieceSplit.split(col("word"), pieces, mark = false).as("p"))
      .select((element_at(col("p"), 1) === "[UNK]").as("unk"), size(col("p")).as("n"))
      .agg(
        count(lit(1)).as("n_words"),
        coalesce(sum(when(col("unk"), 1L).otherwise(0L)), lit(0L)).as("n_unk_words"),
        coalesce(sum(when(col("unk"), 1L).otherwise(col("n").cast("long"))), lit(0L))
          .as("n_pieces"))
    BatchStore.writeBatch(stats, storeDir, batchId)
  }

  private def emptyStats(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Long, Long)]
      .toDF("batch", "n_words", "n_unk_words", "n_pieces")
  }

  /** Per-batch stats with exact rates. Serving BEFORE the first batch
    * returns an empty frame, never throws (the graceful-empty contract
    * every sibling store follows) — including the torn-dir window where
    * the first batch crashed mid-write and the store holds no committed
    * parquet footers yet (schema inference would throw exactly during
    * the incident the monitor exists to observe). Zero-word batches
    * carry rate 0.
    */
  def readStats(spark: SparkSession, storeDir: String): DataFrame = {
    val raw = BatchStore.readAll(spark, storeDir).getOrElse(
      return emptyStats(spark)
        .withColumn("oov_rate", lit(0.0)).withColumn("fertility", lit(0.0)))
    raw
      .select(col("batch").cast("long"), col("n_words"), col("n_unk_words"),
        col("n_pieces"))
      .withColumn("oov_rate",
        when(col("n_words") === 0, lit(0.0))
          .otherwise(col("n_unk_words").cast("double") / col("n_words")))
      .withColumn("fertility",
        when(col("n_words") === col("n_unk_words"), lit(0.0))
          .otherwise((col("n_pieces") - col("n_unk_words")).cast("double") /
            (col("n_words") - col("n_unk_words"))))
  }

  /** The drift verdict: latest batch vs the baseline window (the first
    * `baselineBatches` batches, pooled). Flags when the latest OOV rate
    * exceeds `oovFactor` × baseline — guarded by BOTH an absolute rate
    * floor (`oovFloor`, so a near-zero-OOV baseline isn't paged by rate
    * noise) and a minimum unknown-word COUNT (`minUnkWords`: a rate
    * floor alone still lets one typo page a sub-100-word batch) — or
    * when fertility exceeds `fertilityFactor` × baseline.
    * One row: baseline/latest rates + the boolean. Empty store or a
    * store still inside the baseline window → no verdict row (nothing
    * to compare yet).
    */
  def drift(spark: SparkSession, storeDir: String, baselineBatches: Int = 1,
            oovFactor: Double = 3.0, oovFloor: Double = 0.01,
            fertilityFactor: Double = 1.5, minUnkWords: Long = 2L): DataFrame = {
    require(baselineBatches >= 1, s"baselineBatches must be >= 1")
    val stats = readStats(spark, storeDir)
      .select("batch", "n_words", "n_unk_words", "n_pieces")
      .orderBy("batch").collect() // store is batch-count-sized, never data-sized
    import spark.implicits._
    if (stats.length <= baselineBatches)
      return Seq.empty[(Double, Double, Double, Double, Boolean)].toDF(
        "baseline_oov", "latest_oov", "baseline_fertility",
        "latest_fertility", "drifted")
    def rates(rows: Array[Row]): (Double, Double) = {
      val w = rows.map(_.getLong(1)).sum
      val u = rows.map(_.getLong(2)).sum
      val p = rows.map(_.getLong(3)).sum
      val oov = if (w == 0) 0.0 else u.toDouble / w
      val fert = if (w - u == 0) 0.0 else (p - u).toDouble / (w - u)
      (oov, fert)
    }
    val (bOov, bFert) = rates(stats.take(baselineBatches))
    val (lOov, lFert) = rates(Array(stats.last))
    val lUnk = stats.last.getLong(2)
    val drifted =
      (lUnk >= minUnkWords && lOov > math.max(bOov * oovFactor, oovFloor)) ||
        (bFert > 0 && lFert > bFert * fertilityFactor)
    Seq((bOov, lOov, bFert, lFert, drifted)).toDF(
      "baseline_oov", "latest_oov", "baseline_fertility",
      "latest_fertility", "drifted")
  }
}
