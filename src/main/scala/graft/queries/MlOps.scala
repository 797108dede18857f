package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables
import graft.cluster.Clustering
import graft.multimodal.Multimodal

/** ML / clustering / multimodal declared queries. The clustering results
  * are seeded and structurally deterministic (row counts, cluster count)
  * but not SQL-expressible — they get rows-only driver checks (no oracle
  * entry). Sessionization is fully relational and oracle-checked.
  */
object MlOps {

  type Q = (SparkSession, String) => DataFrame

  /** Build-once embedding feature table (the feature-store shape: vectors
    * are materialized once per dataset and every training/serving query
    * reads the same artifact). The iterative fits stay in each query —
    * only the shared input preparation is amortized, exactly like the
    * dedup chain's signature index.
    */
  private def embFeatures(s: SparkSession, d: String): DataFrame =
    PipelineOps.memoized(s, d, "emb_features") {
      // a handful of partitions: each Lloyd iteration is one job over
      // these rows, and at this row count per-task scheduling dominates;
      // at real scale the partition count comes from the data size
      Clustering.embeddingFeatures(Tables.embeddings(s, d), "vec_id", "embedding")
        .coalesce(4).localCheckpoint(true)
    }

  /** Build-once TF-IDF document-vector table (task 2.2's model input) —
    * the text pipeline, vocabulary indexing, and sparse vectorization run
    * once per dataset; each clustering query fits its own model over the
    * materialized vectors.
    */
  private def docVectors(s: SparkSession, d: String): DataFrame =
    PipelineOps.memoized(s, d, "doc_vectors") {
      // tfidf is cached: it feeds the vocab build and the triples join —
      // without the cache the whole text pipeline re-executes for each.
      val tfidf = TextPipeline.tfidf(s, d).cache()
      // contiguous 0-based term ids via order-preserving zipWithIndex —
      // not a global row_number window, which would single-partition the
      // vocabulary at scale (SURVEY S2)
      val vocab = {
        import s.implicits._
        tfidf.select("token").distinct().orderBy("token")
          .as[String].rdd.zipWithIndex()
          .map { case (t, i) => (t, i.toInt) }.toDF("token", "term_id")
      }.cache() // read twice: the triples join and the vocab-size count
      val triples = tfidf.join(vocab, "token").select("doc_id", "term_id", "tfidf")
      val vocabSize = vocab.count().toInt
      // coalesce before the iterative fit: each Lloyd iteration is a job
      // over the materialized vectors, and with only thousands of small
      // rows the per-task scheduling overhead of 32 partitions dominates —
      // at real scale the shuffle output would fill these partitions and
      // the coalesce becomes a no-op (target ~max(8, rows/50k) partitions).
      val vecs = Clustering.vectorize(triples, "doc_id", "term_id", "tfidf", vocabSize)
      val nParts = math.max(8, (vecs.count() / 50000L).toInt)
      val compact = vecs.coalesce(nParts).localCheckpoint(true) // eager
      tfidf.unpersist(); vocab.unpersist()
      compact
    }

  val queries: Map[String, Q] = Map(
    // M3/M7: MLlib K-Means (euclidean, k-means|| init) on embeddings;
    // output = one assignment row per vector.
    "ml_kmeans_assign" -> ((s, d) => {
      val feats = embFeatures(s, d)
      val model = Clustering.fitKMeans(feats, k = 5, maxIter = 10, seed = 42L)
      model.transform(feats).select(col("vec_id"), col("prediction").as("cluster"))
    }),

    // A10-adjacent: cluster sizes + per-cluster mean norm (cosine path).
    "ml_kmeans_cosine_sizes" -> ((s, d) => {
      val feats = embFeatures(s, d)
      val model = Clustering.fitKMeans(feats, k = 5, maxIter = 10, seed = 42L,
        distanceMeasure = "cosine")
      model.transform(feats).groupBy(col("prediction").as("cluster"))
        .agg(count(lit(1)).as("n_members"))
    }),

    // M7/A11: explicit Lloyd loop — per-iteration per-cluster WCSS rows.
    "ml_lloyd_losses" -> ((s, d) => {
      import s.implicits._
      val res = Clustering.lloydLoop(s, embFeatures(s, d), "vec_id", k = 4, maxIter = 5)
      res.losses.toDF("iteration", "cluster", "wcss")
    }),

    // Doc clustering (task 2.2 shape): TF-IDF vectors -> cosine K-Means
    // over the build-once document-vector table.
    "ml_doc_clusters" -> ((s, d) => {
      val compact = docVectors(s, d)
      // task 2.2's init mode IS random (`sources/2.2/source/KMeans.java:
      // 143-155`); the k-means|| variant is the 2.3 path
      // (BbcTasks.docKMeansScalable)
      val model = Clustering.fitKMeans(compact, k = 5, maxIter = 10, seed = 42L,
        initMode = "random", distanceMeasure = "cosine")
      model.transform(compact).select(col("doc_id"), col("prediction").as("cluster"))
    }),

    // Gap-based sessionization (30-min inactivity) — relational, oracled.
    "ev_sessionize" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("prev_ts", lag("ts", 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
            .otherwise(0))
        .withColumn("session_idx", sum("new_session").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("user_id", "event_id", "session_idx")
    }),

    // Tumbling 15-minute bucket aggregation (batch shape of the streaming
    // window; bucket as epoch seconds for engine-portable rendering).
    "ev_tumbling_15m" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy((floor(unix_timestamp(col("ts")) / 900) * 900).cast("long").as("w_bucket"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))),

    // Multimodal plumbing: synthesize binary payloads, stub-decode to
    // typed metadata (mapPartitions path — rows-only check).
    "mm_decode_meta" -> ((s, d) => {
      val media = Multimodal.synthesizeMedia(Tables.documents(s, d), "doc_id", "text")
      Multimodal.decodeMeta(s, media).toDF()
    }),

    // Multimodal frame sampling (flatMap path). The payload is the text's
    // bytes (pure-ASCII fixture), so the kept frame indices are exactly
    // predictable from the text length — hash-compared against DuckDB.
    "mm_frame_sample" -> ((s, d) => {
      val media = Multimodal.synthesizeMedia(Tables.documents(s, d), "doc_id", "text")
      Multimodal.sampleFrames(s, media).toDF()
        .select("media_id", "frame_idx")
    }),

    // Multimodal payload resize to a byte budget; the resulting byte count
    // is least(len, budget) — hash-compared against DuckDB.
    "mm_resize" -> ((s, d) => {
      val media = Multimodal.synthesizeMedia(Tables.documents(s, d), "doc_id", "text")
      Multimodal.resizePayload(media, targetBytes = 64)
        .select(col("media_id"), col("resized_bytes"))
    }),

    // REAL image decode, oracle-checked: payloads are genuine PNGs whose
    // dimensions are arithmetic in the id, the decoder is javax.imageio,
    // and DuckDB predicts what a correct decoder must recover.
    "mm_image_meta" -> ((s, d) => {
      val imgs = Multimodal.synthesizeImages(Tables.documents(s, d), "doc_id")
      Multimodal.decodeImageMeta(s, imgs).toDF()
        .select("media_id", "width", "height", "channels", "codec")
    }),

    // REAL image resize (bilinear, re-encoded PNG), verified by decoding
    // the resized payload: every output must be exactly 8x8 grayscale.
    "mm_image_resize" -> ((s, d) => {
      val imgs = Multimodal.synthesizeImages(Tables.documents(s, d), "doc_id")
      val resized = Multimodal.resizeImage(s, imgs, targetW = 8, targetH = 8).toDF()
      Multimodal.decodeImageMeta(s, resized).toDF()
        .select("media_id", "width", "height", "channels", "codec")
    }),

    // Multimodal feature extraction: normalized byte histogram over the
    // payload (ASCII fixtures -> byte == char code, so DuckDB can mirror
    // it from the text and the mapPartitions path is hash-compared).
    // Features are emitted as floor(ratio * 1e6) micro-units joined into
    // a string: integer-exact across engines (both compute the identical
    // IEEE divide-then-multiply), and array-typed outputs are unhashable
    // in common verification harnesses.
    "mm_byte_hist" -> ((s, d) => {
      val media = Multimodal.synthesizeMedia(Tables.documents(s, d), "doc_id", "text")
      Multimodal.byteHistogram(s, media, bins = 16).toDF()
        .select(col("media_id"),
          concat_ws(",", transform(col("features"),
            f => floor(f * 1e6).cast("long").cast("string"))).as("features"))
    })
  )

  val oracle: Map[String, String] = Map(
    "ev_sessionize" ->
      """SELECT user_id, event_id, CAST(session_idx AS BIGINT) AS session_idx FROM (
        |  SELECT user_id, event_id,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM (
        |    SELECT user_id, event_id, ts,
        |      CASE WHEN prev_ts IS NULL OR floor(epoch(ts)) - floor(epoch(prev_ts)) > 1800
        |           THEN 1 ELSE 0 END AS new_session
        |    FROM (
        |      SELECT user_id, event_id, ts,
        |        lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |      FROM events) a) b) c""".stripMargin,

    "ev_tumbling_15m" ->
      """SELECT CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) AS w_bucket, event_type,
        |  count(*) AS n_events, sum(value) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // every 4th 64-byte chunk of the payload (= the ASCII text's bytes)
    "mm_frame_sample" ->
      """SELECT doc_id AS media_id, CAST(idx AS INT) AS frame_idx
        |FROM (SELECT doc_id,
        |        unnest(range(0, CAST(ceil(length(text) / 64.0) AS INT))) AS idx
        |      FROM documents) t
        |WHERE idx % 4 = 0""".stripMargin,

    "mm_resize" ->
      """SELECT doc_id AS media_id,
        |  CAST(least(length(text), 64) AS INT) AS resized_bytes
        |FROM documents""".stripMargin,

    // a correct real decoder must recover the synthesized dimensions
    "mm_image_meta" ->
      """SELECT doc_id AS media_id,
        |  CAST(1 + doc_id % 16 AS INT) AS width,
        |  CAST(1 + doc_id % 9 AS INT) AS height,
        |  1 AS channels, 'imageio' AS codec
        |FROM documents""".stripMargin,

    "mm_image_resize" ->
      """SELECT doc_id AS media_id,
        |  8 AS width, 8 AS height, 1 AS channels, 'imageio' AS codec
        |FROM documents""".stripMargin,

    // bytes == ascii codes (pure-ASCII fixture), bins of 16; micro-unit
    // floor matches the declared query's canonicalization exactly
    "mm_byte_hist" ->
      """SELECT doc_id AS media_id,
        |  array_to_string(list_transform(range(0, 16), b ->
        |    CAST(floor(len(list_filter(codes, c -> c // 16 = b)) * 1.0
        |      / greatest(len(codes), 1) * 1000000.0) AS BIGINT)), ',') AS features
        |FROM (SELECT doc_id,
        |        list_transform(regexp_split_to_array(text, ''), c -> ascii(c)) AS codes
        |      FROM documents) t""".stripMargin
  )
}
