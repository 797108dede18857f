package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks for the 100 TB posture. AQE's skew-join
  * splitting handles most runtime skew; these are the declarative forms
  * for when the skew is known ahead of time.
  */
object Skew {

  /** Two-phase (salted) aggregation: partial-aggregate on (keys, salt),
    * then final-aggregate on keys. Spark's hash aggregate already does
    * map-side partials — salting additionally splits a hot *reduce* key
    * across `saltBuckets` reducers, bounding any single task's input when
    * one key dominates (e.g. one language owning half the corpus).
    *
    * `partialAggs` must be algebraic (sum/count/min/max style) so
    * re-aggregating partials is exact; pass the matching `finalAggs` over
    * the partial columns.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                      partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted broadcast-side replication for a skewed equi-join: explode the
    * (small) build side `saltBuckets` ways and salt the probe side, so one
    * hot key's probe rows spread over `saltBuckets` tasks instead of one.
    * Exact same join result as the unsalted join.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    val saltedProbe = probe.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
    val saltedBuild = build.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedProbe.join(saltedBuild, Seq(key, "__salt")).drop("__salt")
  }
}
