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
      // misses every join against raw path-derived identities
      .withColumn("path", url_decode(input_file_name()))
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
