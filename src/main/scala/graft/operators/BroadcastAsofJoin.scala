package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Broadcast as-of join as a full custom operator: logical node + planner
  * strategy + physical exec, registered through `SparkSessionExtensions`
  * (or [[BroadcastAsofJoin.ensureRegistered]] on a live session).
  *
  * The union+window [[AsofJoin]] costs one shuffle+sort of BOTH sides on
  * (key, time). When the right side is dimension-sized (rate tables,
  * model-version history, config changelogs — the common as-of shape),
  * that shuffle of the fact side is pure waste: this operator collects
  * the right side once, builds per-key time-sorted arrays, broadcasts
  * them, and probes with a binary search per left row. The 100 TB fact
  * side stays map-only — no exchange, no sort, pipeline-friendly — and
  * the probe is O(log m) per row.
  *
  * Semantics match [[AsofJoin]] (and DuckDB's `ASOF LEFT JOIN`): for each
  * left row, the single right row with the greatest `rightTime <=
  * leftTime` on the same key; payload columns are null when none exists.
  * `right` must be unique per (key, time) for a deterministic result.
  */
object BroadcastAsofJoin {

  /** Resolved custom logical node. Constructed only from analyzed child
    * plans, so the analyzer passes it through untouched; the optimizer
    * treats it as an opaque binary node and still optimizes both children
    * (pushdown/pruning run below it as usual).
    */
  case class BroadcastAsofJoinPlan(
      left: LogicalPlan, right: LogicalPlan,
      leftKey: Attribute, leftTime: Attribute,
      rightKey: Attribute, rightTime: Attribute,
      payload: Seq[Attribute]) extends BinaryNode {
    override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): BroadcastAsofJoinPlan =
      copy(left = newLeft, right = newRight)
  }

  /** Plans the logical node; everything else falls through to the built-in
    * strategies.
    */
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case BroadcastAsofJoinPlan(l, r, lk, lt, rk, rt, payload) =>
        BroadcastAsofJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, payload) :: Nil
      case _ => Nil
    }
  }

  /** Time-sorted right-side state for one key: parallel arrays, binary
    * searched on probe.
    */
  private final case class KeyedSeries(times: Array[Long], rows: Array[InternalRow])

  case class BroadcastAsofJoinExec(
      left: SparkPlan, right: SparkPlan,
      leftKey: Attribute, leftTime: Attribute,
      rightKey: Attribute, rightTime: Attribute,
      payload: Seq[Attribute]) extends BinaryExecNode {

    override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsofJoinExec =
      copy(left = newLeft, right = newRight)

    /** Times are compared as the internal long of an integral, timestamp,
      * or date column (micros for timestamps, days for dates).
      */
    private def asLong(v: Any): Long = v match {
      case l: java.lang.Long => l
      case i: java.lang.Integer => i.toLong
      case other => throw new IllegalArgumentException(
        s"as-of time must be integral/timestamp/date, got $other")
    }

    private def checkTimeType(e: Expression): Unit = e.dataType match {
      case LongType | IntegerType | TimestampType | DateType => ()
      case t => throw new IllegalArgumentException(s"unsupported as-of time type $t")
    }

    /** Normalize a key for map lookup: UTF8String from transient probe rows
      * is hashed/compared by value, so only build-side copies are needed.
      */
    private def keyOf(v: Any): Any = v match {
      case s: UTF8String => s.copy()
      case other => other
    }

    override protected def doExecute(): RDD[InternalRow] = {
      checkTimeType(leftTime); checkTimeType(rightTime)
      val rk = BindReferences.bindReference(rightKey: Expression, right.output)
      val rt = BindReferences.bindReference(rightTime: Expression, right.output)
      val payloadProj = UnsafeProjection.create(payload.map(e => e: Expression), right.output)

      // Build on the driver from the (small) right side, then broadcast.
      val built: Map[Any, KeyedSeries] = right.executeCollect().iterator
        .flatMap { row =>
          val k = rk.eval(row)
          val t = rt.eval(row)
          if (k == null || t == null) Iterator.empty
          else Iterator((keyOf(k), asLong(t), payloadProj(row).copy(): InternalRow))
        }
        .toArray
        .groupBy(_._1)
        .map { case (k, entries) =>
          val sorted = entries.sortBy(_._2)
          k -> KeyedSeries(sorted.map(_._2), sorted.map(_._3))
        }
      val bc = sparkContext.broadcast(built)

      val lkUnbound: Expression = leftKey
      val ltUnbound: Expression = leftTime
      val leftOutput = left.output
      val outAttrs = output
      val payloadWidth = payload.length

      left.execute().mapPartitions({ iter =>
        val lk = BindReferences.bindReference(lkUnbound, leftOutput)
        val lt = BindReferences.bindReference(ltUnbound, leftOutput)
        val outProj = UnsafeProjection.create(outAttrs.map(e => e: Expression),
          leftOutput ++ payload)
        val joined = new JoinedRow
        val nullRow = new GenericInternalRow(payloadWidth)
        val series = bc.value
        iter.map { lrow =>
          val k = lk.eval(lrow)
          val t = lt.eval(lrow)
          val matched: InternalRow =
            if (k == null || t == null) nullRow
            else series.get(keyOf(k)) match {
              case None => nullRow
              case Some(s) =>
                // greatest index with times(i) <= t (binary search)
                var lo = 0
                var hi = s.times.length - 1
                var found = -1
                val tl = asLong(t)
                while (lo <= hi) {
                  val mid = (lo + hi) >>> 1
                  if (s.times(mid) <= tl) { found = mid; lo = mid + 1 }
                  else hi = mid - 1
                }
                if (found < 0) nullRow else s.rows(found)
            }
          outProj(joined(lrow, matched))
        }
      }, preservesPartitioning = true)
    }
  }

  /** Register the planner strategy on a live session (idempotent). */
  def ensureRegistered(spark: SparkSession): Unit =
    ColumnBridge.addStrategy(spark, Strategy)

  /** Public API, mirroring [[AsofJoin.asofJoin]] but with flat (unnested)
    * payload columns: left columns ++ `rightPayload` (nullable).
    */
  def asofJoinBroadcast(left: DataFrame, right: DataFrame, key: String,
                        leftTime: String, rightTime: String,
                        rightPayload: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lPlan = left.queryExecution.analyzed
    // Fresh aliases give the right side new exprIds: when both inputs
    // derive from the same scan, re-analysis dedups the right subtree's
    // ids, and it can only rewrite references it can see — which excludes
    // this custom node's fields. The alias barrier keeps them stable.
    import org.apache.spark.sql.functions.col
    val rPlan = right.select(right.columns.toSeq.map(c => col(c).as(c)): _*)
      .queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${plan.output.map(_.name).mkString(", ")}]"))
    ColumnBridge.ofRows(spark, BroadcastAsofJoinPlan(
      lPlan, rPlan,
      attr(lPlan, key), attr(lPlan, leftTime),
      attr(rPlan, key), attr(rPlan, rightTime),
      rightPayload.map(attr(rPlan, _))))
  }
}
