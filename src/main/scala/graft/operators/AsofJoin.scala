package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single latest right row with
  * `rightTime <= leftTime` on the same key (the temporal join behind
  * "state as of event time" lookups — absent from both the reference and
  * Spark's built-ins; SURVEY §2.3).
  *
  * Implementation is the merge-style composition, not a range cross join:
  * tag and union both sides, one window pass per key ordered by
  * (time, side) forward-fills the most recent right payload, then keep
  * the left rows. One shuffle + sort on (key, time) total — the same cost
  * as a sort-merge join, independent of time-gap width, no candidate
  * blow-up. Right rows sort before left rows at equal timestamps, so the
  * match is inclusive (`rt <= lt`).
  *
  * `right` must be unique per (key, time) for a deterministic result —
  * pre-aggregate it if not (the DuckDB ASOF JOIN oracle has the same
  * requirement).
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val payloadStruct = struct(rightPayload.map(col): _*)
    val l = left.withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__rp", lit(null).cast(
        right.select(payloadStruct).schema.head.dataType))
    val r = right.select(
      (col(key) +: Seq(
        col(rightTime).as("__t"), lit(0).as("__side"),
        payloadStruct.as("__rp"))): _*)
    // align columns for the union: right side carries nulls for left cols
    val rAligned = leftCols.filterNot(_ == key).foldLeft(r) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols.map(col) ++ Seq(col("__t"), col("__side"), col("__rp"))): _*)
    val unioned = l.select((leftCols.map(col) ++ Seq(col("__t"), col("__side"), col("__rp"))): _*)
      .unionByName(rAligned)

    val w = Window.partitionBy(key).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      // NULL-key semantics: Window.partitionBy groups all NULL keys into
      // one partition, which would let a NULL-key left row pick up a
      // NULL-key right row's payload — but an equality-keyed as-of join
      // (DuckDB ASOF, BroadcastAsofJoin) never matches NULL keys. Null
      // out the fill for NULL-key rows so all three agree.
      .withColumn("__asof", when(col(key).isNotNull,
        last("__rp", ignoreNulls = true).over(w)))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) :+ col("__asof")): _*)
  }
}
