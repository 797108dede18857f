package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BBC-style corpus source (SURVEY §2.1 S1): a recursive directory tree of
  * plain-text files, one document per file, with identity derived from the
  * path — `<parent-dir>.<file-stem>` (stem = filename up to the first
  * dot); files whose stem is `README` are skipped
  * (`sources/1.1/source/task1_1.java:43-49`).
  *
  * One row per *line* (the reference maps line-at-a-time); callers that
  * want whole documents can `groupBy(doc_name).agg(concat_ws("\n", ...))`.
  */
object BbcCorpus {

  def readLines(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read
      .option("recursiveFileLookup", "true")
      .text(dir)
      // input_file_name() returns a URL-ENCODED URI: a category or file
      // name with a space/non-ASCII char would otherwise yield a
      // percent-escaped doc_name ("sport%20news.001") that silently
      // misses every join against raw path-derived identities.
      // url_decode applies FORM semantics ('+' → space), but
      // input_file_name does not percent-encode '+', so a literal plus
      // in a path must be re-escaped to %2B first or it decodes to a
      // space — the same silent-join-miss class the decode fixes.
      .withColumn("path",
        url_decode(regexp_replace(input_file_name(), "\\+", "%2B")))
    val parts = split(col("path"), "/")
    val fileName = element_at(parts, -1)
    val category = element_at(parts, -2)
    val stem = split(fileName, "\\.").getItem(0)
    raw
      .withColumn("doc_name", concat(category, lit("."), stem))
      .filter(stem =!= "README")
      .select(col("doc_name"), col("value").as("line"))
  }
}
