package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset manifests — the reproducibility anchor a training pipeline
  * records beside every frozen input: per table, the row count, the
  * schema signature, and an ORDER-INSENSITIVE content fingerprint, so
  * a later run (or another engine) can prove it is reading byte-the-same
  * data before spending compute on it.
  *
  * The fingerprint is `Σ rolling_hash(row repr) mod p` over all rows —
  * one partial-aggregated pass per table (map-side sums, a single long
  * of state per partition, no sort and no collect), insensitive to row
  * order and file layout (a compaction or repartition of the same rows
  * fingerprints identically) and engine-portable: `rolling_hash` is the
  * house polynomial hash every DuckDB oracle replays, and the sum
  * accumulates in DECIMAL(38,0) — 2³¹-sized terms in an int64 would
  * wrap past ~4·10⁹ rows, a row count a 100 TB table exceeds (DuckDB's
  * `sum(BIGINT)` widens to HUGEINT on its own, the same contract).
  *
  * The row repr is INJECTIVE: every cell's string form is escaped
  * (`\u0003` doubles itself, then prefixes any literal `\u0001`/`\u0002`),
  * cells join with `\u0001`, and NULL encodes as a bare `\u0002` — which,
  * post-escaping, can never be produced by data. A value containing a
  * separator therefore cannot alias a column boundary, a literal
  * `"\u0002"` cell stays distinct from NULL, and `("ab","c")` never
  * collides with `("a","bc")` — no pre-escaping duty on the caller,
  * even for adversarial corpora. Decode (never needed, but the
  * injectivity witness): scan left to right, `\u0003` escapes the next
  * char, a bare `\u0001` is a boundary, a bare single-`\u0002` cell is
  * NULL.
  *
  * Not a cryptographic digest: this detects drift (a regenerated
  * export, a lost partition, a truncated copy), not adversaries.
  */
object Manifest {

  private val P = 2147483647L // 2^31 − 1 (Mersenne), the house hash modulus

  final case class TableManifest(table: String, n_rows: Long,
                                 schema_sig: String, fingerprint: Long)

  /** The fingerprint AGGREGATE over a row-repr column — exposed so a
    * declared query can emit the manifest arithmetic relationally (and
    * the DuckDB oracle replay it value-for-value).
    */
  def fingerprintCol(repr: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    // no per-term reduction: rolling_hash is already reduced mod 10⁹+7
    // at every byte, so its output is strictly below P and a `% P` per
    // term would be dead arithmetic every replaying oracle had to carry
    (sum(graft.functions.TextExprs.rollingHash(repr)
      .cast("decimal(38,0)")) % P).cast("long")

  /** The canonical row repr of a frame (every column stringified, nulls
    * → the `\u0002` sentinel, `\u0001`-joined) — the exact input
    * [[fingerprint]] hashes, exposed for incremental maintainers that
    * fingerprint one batch at a time.
    */
  def reprCol(df: DataFrame): org.apache.spark.sql.Column =
    concat_ws("\u0001",
      df.schema.fieldNames.map(f =>
        coalesce(escCell(col(f).cast("string")), lit("\u0002"))).toSeq: _*)

  /** Escape one cell's string form for the injective row repr: the
    * escape char `\u0003` doubles itself FIRST, then prefixes each
    * sentinel (that order matters — escaping sentinels first would let
    * a literal `\u0003\u0001` in the data alias an escaped separator).
    * Three codegen `replace` passes per column — pure map, replayed
    * verbatim by the DuckDB oracles ([[graft.queries.SqlSurface]]).
    */
  def escCell(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    replace(
      replace(
        replace(c, lit("\u0003"), lit("\u0003\u0003")),
        lit("\u0001"), lit("\u0003\u0001")),
      lit("\u0002"), lit("\u0003\u0002"))

  /** Fold PARTIAL fingerprints (each already reduced mod p) into the
    * whole-dataset fingerprint: the modular sum is a commutative group,
    * so per-batch sums combine to exactly [[fingerprint]] of the union —
    * what makes the manifest incrementally maintainable
    * ([[graft.streaming.IncrementalManifest]]).
    */
  def foldFingerprints(partial: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (sum(partial.cast("decimal(38,0)")) % P).cast("long")

  /** The fingerprint row of one DataFrame: every column stringified
    * (nulls become the literal `\u0002` sentinel, distinct from both
    * empty string and any data), concatenated with the `\u0001`
    * delimiter, rolling-hashed, summed mod [[P]].
    */
  def fingerprint(df: DataFrame): (Long, Long) = {
    val row = df.select(
      count(lit(1)).as("n"),
      fingerprintCol(reprCol(df)).as("fp"))
      .head
    (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
  }

  private def schemaSig(df: DataFrame): String =
    df.schema.fields.map(f => s"${f.name}:${f.dataType.sql}").mkString(",")

  /** Row-level content diff of two SAME-SCHEMA frames — the release
    * audit the one-number fingerprint can't give: per distinct row-repr
    * hash, the multiplicity on each side. One partial-aggregated
    * shuffle per side on the hash + one full-outer equi-join of the
    * (distinct-row-sized) count tables; the rows themselves never
    * co-shuffle. Same caveat as the fingerprint: this is a HASH
    * compare — colliding rows (mod-10⁹+7 rolling hash) alias, so it
    * witnesses difference exactly but certifies equality only
    * probabilistically (and inherits [[reprCol]]'s sentinel
    * assumption).
    */
  def diff(a: DataFrame, b: DataFrame): DataFrame = {
    require(schemaSig(a) == schemaSig(b),
      s"manifest diff requires identical schemas: ${schemaSig(a)} vs ${schemaSig(b)}")
    def side(df: DataFrame, n: String) =
      df.select(graft.functions.TextExprs.rollingHash(reprCol(df)).as("h"))
        .groupBy("h").agg(count(lit(1)).as(n))
    side(a, "cnt_a").join(side(b, "cnt_b"), Seq("h"), "full_outer")
      .select(col("h"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
  }

  /** [[diff]] folded to the one-row release-audit summary: total rows
    * per side, rows only in A / only in B (multiset semantics —
    * `Σ max(cnt_a − cnt_b, 0)` per content hash, so extra duplicates
    * count), and the common multiset size. A changed row is one
    * only-A plus one only-B (content identity has no row keys).
    */
  def diffSummary(a: DataFrame, b: DataFrame): DataFrame =
    diff(a, b).agg(
      // coalesce: two EMPTY releases produce a zero-row diff, and a bare
      // sum would emit one all-NULL row — a gate reading the longs would
      // NPE on unboxing instead of seeing the correct zeros
      coalesce(sum("cnt_a"), lit(0L)).cast("long").as("rows_a"),
      coalesce(sum("cnt_b"), lit(0L)).cast("long").as("rows_b"),
      coalesce(sum(greatest(col("cnt_a") - col("cnt_b"), lit(0L))), lit(0L))
        .cast("long").as("rows_only_a"),
      coalesce(sum(greatest(col("cnt_b") - col("cnt_a"), lit(0L))), lit(0L))
        .cast("long").as("rows_only_b"),
      coalesce(sum(least(col("cnt_a"), col("cnt_b"))), lit(0L))
        .cast("long").as("rows_common"))

  /** Compute the manifest of every table under `sfDir` ([[Tables.names]]). */
  def compute(spark: SparkSession, sfDir: String): Seq[TableManifest] =
    Tables.names.map { t =>
      // events goes through its CANONICALIZING loader: the raw load is
      // session-history-dependent (ts resolves TIMESTAMP or
      // TIMESTAMP_NTZ depending on which reader cached the relation
      // first — a schema_sig that flips across sessions false-alarms
      // the drift check this manifest exists to serve) and rejects the
      // legacy int64-nanos encoding outright
      val df = if (t == "events") Tables.events(spark, sfDir)
               else Tables.load(spark, sfDir, t)
      val (n, fp) = fingerprint(df)
      TableManifest(t, n, schemaSig(df), fp)
    }

  /** Write the manifest of `sfDir` to `path` (one tiny parquet). */
  def write(spark: SparkSession, sfDir: String, path: String): Unit = {
    import spark.implicits._
    compute(spark, sfDir).toDF()
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Verify `sfDir` against a written manifest: recompute every table's
    * count/schema/fingerprint and return the mismatches (empty = the
    * data is provably the same rows). A table missing from either side
    * is a mismatch.
    */
  def verify(spark: SparkSession, sfDir: String, path: String): Seq[String] = {
    import spark.implicits._
    val recorded = spark.read.parquet(path).as[TableManifest]
      .collect().map(m => m.table -> m).toMap
    val current = compute(spark, sfDir).map(m => m.table -> m).toMap
    val tables = (recorded.keySet ++ current.keySet).toSeq.sorted
    tables.flatMap { t =>
      (recorded.get(t), current.get(t)) match {
        case (None, _) => Some(s"$t: not in the recorded manifest")
        case (_, None) => Some(s"$t: missing from the dataset")
        case (Some(r), Some(c)) if r != c =>
          Some(s"$t: recorded (rows=${r.n_rows}, fp=${r.fingerprint}) != " +
            s"current (rows=${c.n_rows}, fp=${c.fingerprint})" +
            (if (r.schema_sig != c.schema_sig) " [schema changed]" else ""))
        case _ => None
      }
    }
  }
}
