package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{GraphOps, MlOps, PipelineOps, Relational, SqlSurface, TextPipeline}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the declared-query modules; every entry with a
  * SQL-expressible semantics also appears in `oracleSql` (same column
  * names both sides — the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the full text pipeline down
    * to per-language top-5 terms by average TF-IDF (tasks 1.1→1.5 shape).
    */
  def entry(spark: SparkSession): DataFrame =
    TextPipeline.queries("t5_category_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextPipeline.queries ++ PipelineOps.queries ++
      MlOps.queries ++ SqlSurface.queries ++ GraphOps.queries

  /** DuckDB-equivalent SQL for every SQL-expressible query above. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ TextPipeline.oracle ++ PipelineOps.oracle ++
      MlOps.oracle ++ SqlSurface.oracle ++ GraphOps.oracle
}
