package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared store-adapter harness: binds every incremental store in this
  * package to one uniform surface (`ingest` a deterministic batch,
  * `state` = every observable serving read canonicalized, `compact`,
  * `swapDirs` = the dirs governed by the CompactionSwap protocol).
  * Used by [[BatchStoreContractSpec]] (the shared protocol contract)
  * and [[CrashFuzzSpec]] (exhaustive crash-point injection over the
  * compaction path).
  */
object StoreHarness {

  /** Canonical, path-independent rendering of a frame: columns sorted
    * by name, rows collected and sorted as strings.
    */
  def canon(df: DataFrame): String = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toString).sorted.mkString("\n")
  }

  /** `batch` (the partition column) is layout, not state: compaction
    * folds ids into batch=0 by design, so state equality is over the
    * data columns only.
    */
  def canonAll(spark: SparkSession, dir: String): String =
    BatchStore.readAll(spark, dir).fold("<empty>")(df =>
      canon(df.drop("batch")))

  final case class StoreAdapter(
      name: String,
      ingest: (String, Int) => Unit,
      state: String => String,
      emptyState: Option[String => String],
      compact: Option[String => Unit],
      swapDirs: String => Seq[String])

  // ---- fixture data ----------------------------------------------------
  // Deterministic per batch; overlapping content across batches so the
  // dedup stores exercise their store-hit paths.

  private val textPool = Seq(
    "the quick brown fox jumps over the lazy dog today",
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed",
    "alpha beta gamma delta epsilon zeta eta theta iota kappa")

  private def spark = graft.SparkTestSession.spark

  def docBatch(i: Int): DataFrame = {
    val s = spark; import s.implicits._
    (0 until 4).map { j =>
      (i * 10L + j, textPool((i + j) % textPool.size) + s" tail$i$j")
    }.toDF("id", "text")
  }

  def vecBatch(i: Int): DataFrame = {
    val s = spark; import s.implicits._
    (0 until 4).map { j =>
      val base = Array(1.0 + (i + j) % 3, 2.0 + j % 2, 3.0, 1.0 + j)
      (i * 10L + j, base.map(_ * (1.0 + 0.5 * (i % 2)))) // rescaled copies
    }.toDF("vec_id", "vec")
  }

  def eventBatch(i: Int): DataFrame = {
    val s = spark; import s.implicits._
    (0 until 5).map { j =>
      (((i + j) % 4).toLong,
        java.sql.Timestamp.valueOf(s"2024-01-0${(i % 3) + 1} 0$j:00:00"))
    }.toDF("user_id", "ts")
  }

  def keyBatch(i: Int): DataFrame = {
    val s = spark; import s.implicits._
    ((0 until 8).map(j => s"k${(i + j) % 5}") ++ Seq("hot", "hot"))
      .toDF("key")
  }

  val wpPieces = Seq("the", "quick", "fox", "lo", "##rem", "alpha")

  // ---- adapters --------------------------------------------------------

  def adapters: Seq[StoreAdapter] = {
    val s = spark; import s.implicits._
    Seq(
      StoreAdapter(
        name = "IncrementalDedup",
        ingest = (root, i) => IncrementalDedup.processBatch(
          docBatch(i), i.toLong, "id", "text", s"$root/store", s"$root/dup",
          n = 3, bands = 4, rowsPerBand = 2, keptDir = Some(s"$root/kept")),
        state = root => Seq(s"$root/store", s"$root/dup", s"$root/kept")
          .map(canonAll(spark, _)).mkString("\n--\n"),
        emptyState = None,
        compact = Some(root =>
          IncrementalDedup.compactStore(spark, s"$root/store")),
        swapDirs = root => Seq(s"$root/store")),

      StoreAdapter(
        name = "IncrementalCdcDedup",
        ingest = (root, i) => IncrementalCdcDedup.processBatch(
          docBatch(i), i.toLong, "id", "text", s"$root/store", s"$root/clean",
          k = 4, divisor = 4L),
        state = root => Seq(s"$root/store", s"$root/clean")
          .map(canonAll(spark, _)).mkString("\n--\n"),
        emptyState = None,
        compact = Some(root =>
          IncrementalCdcDedup.compactStore(spark, s"$root/store")),
        swapDirs = root => Seq(s"$root/store")),

      StoreAdapter(
        name = "IncrementalEmbedDedup",
        ingest = (root, i) => IncrementalEmbedDedup.processBatch(
          vecBatch(i), i.toLong, "vec_id", "vec", s"$root/store", s"$root/dup",
          threshold = 0.9, numPlanes = 3, dim = 4, seed = 7L,
          keptDir = Some(s"$root/kept")),
        state = root => Seq(s"$root/store", s"$root/dup", s"$root/kept")
          .map(canonAll(spark, _)).mkString("\n--\n"),
        emptyState = None,
        compact = Some(root =>
          IncrementalEmbedDedup.compactStore(spark, s"$root/store")),
        swapDirs = root => Seq(s"$root/store")),

      StoreAdapter(
        name = "IncrementalManifest",
        ingest = (root, i) => IncrementalManifest.processBatch(
          (0 until 3).map(j => (i * 10L + j, s"row-$i-$j")).toDF("k", "v"),
          i.toLong, s"$root/store"),
        state = root => IncrementalManifest.read(spark, s"$root/store").toString,
        emptyState = Some(root =>
          IncrementalManifest.read(spark, s"$root/store").toString),
        compact = Some(root =>
          IncrementalManifest.compact(spark, s"$root/store")),
        swapDirs = root => Seq(s"$root/store")),

      StoreAdapter(
        name = "IncrementalCardinality",
        ingest = (root, i) => IncrementalCardinality.processBatch(
          eventBatch(i), i.toLong, "user_id", "ts", s"$root/store",
          lgConfigK = 14),
        state = root =>
          canon(IncrementalCardinality.readDailyEstimates(spark, s"$root/store")) +
            "\n--\n" +
            IncrementalCardinality.readTotalEstimate(spark, s"$root/store"),
        emptyState = Some(root =>
          canon(IncrementalCardinality.readDailyEstimates(spark, s"$root/store")) +
            "\n--\n" +
            IncrementalCardinality.readTotalEstimate(spark, s"$root/store")),
        compact = Some(root =>
          IncrementalCardinality.compactStore(spark, s"$root/store")),
        swapDirs = root => Seq(s"$root/store")),

      StoreAdapter(
        name = "IncrementalHeavyHitters",
        ingest = (root, i) => IncrementalHeavyHitters.processBatch(
          keyBatch(i), i.toLong, "key", s"$root/store",
          eps = 1e-4, confidence = 0.999, seed = 42, k = 5),
        state = root =>
          canon(IncrementalHeavyHitters.readTopK(spark, s"$root/store", k = 5)),
        emptyState = Some(root =>
          canon(IncrementalHeavyHitters.readTopK(spark, s"$root/store", k = 5))),
        compact = Some(root =>
          IncrementalHeavyHitters.compactStore(spark, s"$root/store")),
        swapDirs = root => Seq(s"$root/store/sketch", s"$root/store/cand")),

      StoreAdapter(
        name = "IncrementalTokenizerDrift",
        ingest = (root, i) => IncrementalTokenizerDrift.processBatch(
          docBatch(i).select("text"), i.toLong, "text", wpPieces,
          s"$root/store"),
        state = root =>
          canon(IncrementalTokenizerDrift.readStats(spark, s"$root/store")),
        emptyState = Some(root =>
          canon(IncrementalTokenizerDrift.readStats(spark, s"$root/store"))),
        compact = None, // deliberately uncompacted: drift needs per-batch rows
        swapDirs = root => Seq(s"$root/store")),

      StoreAdapter(
        name = "IncrementalAnnIndex",
        ingest = (root, i) => IncrementalAnnIndex.processBatch(
          vecBatch(i), i.toLong, "vec_id", "vec", s"$root/index",
          nlist = 2, refitAt = 0.0, driftCheckEvery = 0, seed = 42L),
        state = root => canon(spark.read.parquet(s"$root/index/cells")
          .select("neighbor_id", "cell")),
        emptyState = None, // query-before-bootstrap is documented as a throw
        compact = None,    // marker-swap refit protocol, pinned in its own spec
        swapDirs = _ => Seq.empty)
    )
  }
}
