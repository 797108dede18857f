package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.io.{BufferedWriter, FileWriter}

/** MatrixMarket coordinate codec (SURVEY §2.1 S4/S5/S6).
  *
  * Reader: skips the two header lines by *global line index* (the
  * reference's per-mapper `row < 2` skip, `sources/1.2/source/
  * task1_2.java:34-42`, drops two data rows per extra split — a bug we fix
  * per SURVEY §7.2) and parses `i j v` triples. Dims come from line 2
  * (`sources/1.4/source/task1_4.java:35-57`).
  *
  * Writer: header + dims + triples. Default ordering is numeric
  * (term_id, doc_id); `legacySort = true` reproduces the reference's
  * lexicographic string sort (`MTXContent.sort(naturalOrder)`,
  * `sources/1.1/source/task1_1.java:142`) for golden-file parity.
  * Single-file output is format-layer-only (driver-side stream), never a
  * `coalesce(1)` in the core plan.
  */
object MtxCodec {

  final case class MtxDims(rows: Long, cols: Long, nnz: Long)

  val schema: StructType = StructType(Seq(
    StructField("term_id", IntegerType),
    StructField("doc_id", IntegerType),
    StructField("value", DoubleType)))

  /** Read a .mtx (with 2 header lines) into (triples, dims). */
  def read(spark: SparkSession, path: String): (DataFrame, MtxDims) = {
    import spark.implicits._
    val lines = spark.read.textFile(path)
    val dimParts = lines.rdd.zipWithIndex()
      .filter(_._2 == 1L).map(_._1).first().trim.split("\\s+")
    val dims = MtxDims(dimParts(0).toLong, dimParts(1).toLong, dimParts(2).toLong)
    val triples = lines.rdd.zipWithIndex()
      .filter(_._2 >= 2L).map(_._1)
      .toDF("line")
      .select(split(trim(col("line")), "\\s+").as("p"))
      .select(
        element_at(col("p"), 1).cast("int").as("term_id"),
        element_at(col("p"), 2).cast("int").as("doc_id"),
        element_at(col("p"), 3).cast("double").as("value"))
    (triples, dims)
  }

  /** Read a headerless triple file (S6 shape, `task_1_4.mtx`). */
  def readHeaderless(spark: SparkSession, path: String): DataFrame =
    spark.read.textFile(path)
      .select(split(trim(col("value")), "\\s+").as("p"))
      .select(
        element_at(col("p"), 1).cast("int").as("term_id"),
        element_at(col("p"), 2).cast("int").as("doc_id"),
        element_at(col("p"), 3).cast("double").as("value"))

  /** Render triples to MTX body lines. `integerValues` prints counts as
    * ints; otherwise `%.6f` (the reference's two observable formats).
    */
  private def bodyLines(triples: DataFrame, integerValues: Boolean,
                        legacySort: Boolean): Iterator[String] = {
    val rendered = triples.select(
      concat_ws(" ", col("term_id"),
        col("doc_id"),
        if (integerValues) col("value").cast("long").cast("string")
        else format_string("%.6f", col("value"))).as("line"),
      col("term_id"), col("doc_id"))
    val ordered =
      if (legacySort) rendered.orderBy("line")
      else rendered.orderBy("term_id", "doc_id")
    import scala.jdk.CollectionConverters._
    ordered.select("line").toLocalIterator().asScala.map(_.getString(0))
  }

  /** Write a full .mtx with header to a local path. Newlines are
    * separators, not terminators — the committed goldens end without a
    * trailing newline and byte parity is part of the contract.
    */
  def write(triples: DataFrame, dims: MtxDims, path: String,
            integerValues: Boolean = false, legacySort: Boolean = false): Unit = {
    val w = new BufferedWriter(new FileWriter(path))
    try {
      w.write("%%MatrixMarket matrix coordinate real general\n")
      w.write(s"${dims.rows} ${dims.cols} ${dims.nnz}")
      bodyLines(triples, integerValues, legacySort).foreach { l => w.write("\n"); w.write(l) }
    } finally w.close()
  }

  /** Write a headerless, deduped triple file (S6: `dropDuplicates` +
    * no header, `sources/1.4/source/task1_4.java:144-179`).
    */
  def writeHeaderless(triples: DataFrame, path: String,
                      integerValues: Boolean = false): Unit = {
    val w = new BufferedWriter(new FileWriter(path))
    try {
      var first = true
      bodyLines(triples.dropDuplicates(), integerValues, legacySort = false)
        .foreach { l => if (!first) w.write("\n"); w.write(l); first = false }
    } finally w.close()
  }
}
