package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the synthetic test tables (TESTDATA.md): TPC-H-ish star
  * schema + `events` + `documents` + `embeddings`, one parquet file per
  * table under a scale-factor directory.
  *
  * All readers go through `spark.read.parquet` so Catalyst gets a real
  * `FileSourceScanExec` with predicate pushdown / column pruning — callers
  * should `.select`/`.filter` as early as possible and let the optimizer
  * push into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Memoized per (session, path): `spark.read.parquet` re-lists files and
    * re-reads footers on every call, which at fleet scale is what a
    * catalog/metastore caches. The tables are read-only test fixtures, so
    * reusing the resolved relation is safe, and repeated queries skip the
    * listing + schema-inference cost.
    */
  private val relationCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    relationCache.getOrElseUpdate((System.identityHashCode(spark).toString, s"$sfDir/$name.parquet"),
      spark.read.parquet(s"$sfDir/$name.parquet"))

  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read nanos as long (legacy conf) and convert to a
    * microsecond TimestampType with integer division (a double division
    * would lose precision above 2^53 ns). Matches DuckDB's nanos→micros
    * truncation, so oracle comparisons line up.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
