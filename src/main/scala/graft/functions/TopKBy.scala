package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

/** Bounded-heap per-group top-k aggregate: keeps the k best
  * (ord DESC, tie ASC) entries per group with their payloads.
  *
  * This is the scale-correct form of per-group top-k. The window-rank
  * formulation (`row_number over (partition by g order by …) <= k`) must
  * shuffle *every* row of a group to one task and sort it; this aggregate
  * keeps k-entry heaps, does map-side partial aggregation (pre-shuffle
  * data per task is ≤ k × distinct-groups-in-partition), and merges heaps
  * on the reduce side — memory and shuffle bounded by k, not group size.
  *
  * The tie column may be any ordered atomic type (bigint order keys,
  * string tokens, …): comparisons go through Catalyst's interpreted
  * ordering for `tie.dataType`, which matches Spark's ASC sort exactly
  * (binary comparison for strings — the engine-portable collation).
  *
  * Result: `array<struct<ord, tie, payload>>`, best first, exactly the
  * (ord DESC, tie ASC) prefix of the group.
  */
case class TopKBy(ord: Expression, tie: Expression, payload: Expression,
                  kExpr: Expression,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBy.Buffer] {

  // construction must be TOTAL (analyzer rules rebuild the node via
  // withNewChildren mid-resolution, when children can be transiently
  // unresolvable); all input validation lives in checkInputDataTypes
  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue

  private lazy val tieOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(tie.dataType)

  override def children: Seq[Expression] = Seq(ord, tie, payload, kExpr)

  /** Fail at ANALYSIS time, not mid-job: an unorderable tie type
    * (MapType) would otherwise pass resolution and only blow up inside
    * `TypeUtils.getInterpretedOrdering` on the first executor row, with
    * an obscure error. Same for a non-numeric ord column, which
    * `update` would ClassCastException on.
    */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("top_k_by: k must be a literal")
    else if (!ord.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by: ord must be numeric, got ${ord.dataType.catalogString}")
    else if (!org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(tie.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by: tie type ${tie.dataType.catalogString} is not orderable")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("tie", tie.dataType, nullable = false),
    StructField("payload", payload.dataType, payload.nullable))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBy.Buffer =
    new TopKBy.Buffer(k, tieOrdering)

  override def update(buffer: TopKBy.Buffer, input: InternalRow): TopKBy.Buffer = {
    val o = ord.eval(input)
    val t = tie.eval(input)
    if (o != null && t != null) {
      buffer.offer(o.asInstanceOf[Number].doubleValue(),
        InternalRow.copyValue(t),
        InternalRow.copyValue(payload.eval(input)))
    }
    buffer
  }

  override def merge(buffer: TopKBy.Buffer, other: TopKBy.Buffer): TopKBy.Buffer = {
    other.entries.foreach(e => buffer.offer(e._1, e._2, e._3))
    buffer
  }

  override def eval(buffer: TopKBy.Buffer): Any =
    new GenericArrayData(buffer.sortedBestFirst.map { case (o, t, p) =>
      new GenericInternalRow(Array[Any](o, t, p)): Any
    }.toArray)

  private lazy val entryProj =
    UnsafeProjection.create(Array[DataType](DoubleType, tie.dataType, payload.dataType))

  override def serialize(buffer: TopKBy.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    buffer.entries.foreach { case (o, t, p) =>
      val row = entryProj(new GenericInternalRow(Array[Any](o, t, p)))
      val bytes = row.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): TopKBy.Buffer = {
    val buffer = new TopKBy.Buffer(k, tieOrdering)
    val in = ByteBuffer.wrap(storage)
    while (in.remaining() > 0) {
      val len = in.getInt
      val bytes = new Array[Byte](len)
      in.get(bytes)
      val row = new UnsafeRow(3)
      row.pointTo(bytes, len)
      buffer.offer(row.getDouble(0),
        InternalRow.copyValue(row.get(1, tie.dataType)),
        InternalRow.copyValue(row.get(2, payload.dataType)))
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKBy =
    copy(ord = newChildren(0), tie = newChildren(1), payload = newChildren(2),
      kExpr = newChildren(3))

  override def prettyName: String = "top_k_by"
}

object TopKBy {

  /** k-bounded heap; the queue's max (dequeue target) is the WORST kept
    * entry — smallest ord, then largest tie.
    *
    * All ord comparisons go through `java.lang.Double.compare` — a total
    * order where NaN sorts greatest, matching Spark's DESC sort (so the
    * heap agrees with the window-rank formulation even on NaN ord values,
    * and the heap invariant never breaks: IEEE `>`/`==` are false for
    * NaN, which would otherwise make NaN rows both undroppable and
    * unadmittable). Tie comparisons use the caller-supplied ordering for
    * the tie column's type.
    */
  final class Buffer(k: Int, tieOrd: Ordering[Any]) {
    private val worstFirst: Ordering[(Double, Any, Any)] =
      new Ordering[(Double, Any, Any)] {
        // "greater" = worse: smaller ord (total order), then larger tie
        def compare(a: (Double, Any, Any), b: (Double, Any, Any)): Int = {
          val c = java.lang.Double.compare(b._1, a._1)
          if (c != 0) c else tieOrd.compare(a._2, b._2)
        }
      }
    private val pq = scala.collection.mutable.PriorityQueue.empty[(Double, Any, Any)](worstFirst)

    def offer(o: Double, t: Any, p: Any): Unit = {
      if (pq.size < k) pq.enqueue((o, t, p))
      else {
        val worst = pq.head
        // is (o, t) better than worst? better = larger ord, then smaller tie
        val c = java.lang.Double.compare(o, worst._1)
        if (c > 0 || (c == 0 && tieOrd.compare(t, worst._2) < 0)) {
          pq.dequeue(); pq.enqueue((o, t, p))
        }
      }
    }

    def entries: Iterator[(Double, Any, Any)] = pq.iterator

    def sortedBestFirst: Seq[(Double, Any, Any)] =
      pq.toSeq.sorted(worstFirst) // ascending in "worseness" = best first
  }

  /** Column builder: top-k payloads per group by (ord DESC, tie ASC). */
  def topKBy(ord: Column, tie: Column, payload: Column, k: Int): Column =
    ColumnBridge.column(
      TopKBy(ColumnBridge.expression(ord), ColumnBridge.expression(tie),
        ColumnBridge.expression(payload), Literal(k))
        .toAggregateExpression())
}
