package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match each fact row's point value to interval
  * rows with `lo <= v < hi` — by binning, not a nested-loop cross
  * product.
  *
  * Both sides map to fixed-width bins: facts to `floor(v / w)`, intervals
  * exploded to every bin they overlap (`sequence(floor(lo/w),
  * floor((hi-ε)/w))`). The join becomes a hash equi-join on the bin plus
  * a cheap residual filter — cost `O(n + Σ interval_width/w)` instead of
  * `O(n·m)`. Pick `binWidth` near the typical interval width so intervals
  * explode to O(1) bins.
  */
object RangeJoin {

  def rangeJoin(facts: DataFrame, valueCol: String,
                intervals: DataFrame, loCol: String, hiCol: String,
                binWidth: Double): DataFrame = {
    val factsB = facts.withColumn("__bin",
      floor(col(valueCol) / binWidth).cast("long"))
    val intervalsB = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        // hi is exclusive: a hi exactly on a bin edge does not reach
        // the next bin
        floor((col(hiCol) - lit(1e-9)) / binWidth).cast("long"))))
    factsB.join(intervalsB, "__bin")
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bin")
  }
}
