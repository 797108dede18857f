package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Line-numbered dictionary source (SURVEY §2.1 S2): a text file where the
  * 1-based line number is the surrogate key (`bbc.terms`, `bbc.docs` —
  * `sources/1.1/source/task1_1.java:92-119`).
  *
  * Uses order-preserving `zipWithIndex`, NOT `monotonically_increasing_id`
  * (which is non-contiguous across partitions — SURVEY §7.4's "easy to get
  * silently wrong").
  */
object Dict {

  /** (id: Int 1-based, value: String trimmed). */
  def load(spark: SparkSession, path: String, idCol: String, valueCol: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path).rdd.zipWithIndex()
      .map { case (line, idx) =>
        // .toInt past 2^31−1 lines would wrap surrogate keys negative
        // and silently corrupt every downstream join — fail loudly
        require(idx < Int.MaxValue - 1,
          s"$path: dictionary exceeds Int surrogate-key range at line $idx")
        ((idx + 1).toInt, line.trim)
      }
      .toDF(idCol, valueCol)
  }

  /** Stopword list (S3): one word per line, trimmed. */
  def loadStopwords(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path).map(_.trim).filter(_.nonEmpty).toDF("word")
  }
}
