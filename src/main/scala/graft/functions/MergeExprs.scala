package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen rank-ordered merge-batch application over a symbol array —
  * the per-word sequential kernel behind the ARRAY-representation
  * tokenizer training loop ([[graft.text.WordPiece.train]] with
  * `batchSize` > 1).
  *
  * Semantics: given a word's current symbol array and a batch of merges
  * in rank order, apply each merge IN RANK ORDER, greedy-leftmost over
  * all its occurrences in the current array — exactly what sequential
  * training's per-rank merge pass does, collapsed into one projection.
  * A merge applied at rank r can create an occurrence of a LATER-rank
  * batch pair; the kernel picks it up when that rank's turn comes (the
  * sequential contract). An occurrence of an EARLIER rank created later
  * stays unmerged this pass and re-enters the count table next pass,
  * again matching the sequential trainer.
  *
  * Replacing the window-based symbol-DISJOINT batch pass with this
  * kernel removes the two structural costs that capped WordPiece
  * training throughput
  * (BASELINE.md `wordpiece_train_apply`: 1,815 passes at mean batch
  * fill 17/256, 1,719 s for 32k ranks): the likelihood ranking clusters
  * its head on shared rare symbols, so symbol-disjointness starved
  * every batch, and each pass paid two full (word, pos) window sorts.
  * Per-word sequential application needs NO disjointness — every batch
  * fills completely — and the apply step is a pure codegen map
  * (no shuffle, no sort).
  *
  * Cost per row: one O(len) presence scan over the adjacent pairs
  * (hash probes into the batch's pair table — most words contain no
  * batch pair and return unchanged), then one O(len) compaction sweep
  * per PRESENT rank, plus an O(len) rescan after a sweep that merged
  * (created adjacencies may involve later ranks). Driver ships the
  * batch once per stage as a plan reference object
  * (`ctx.addReferenceObj`, the [[WordPieceKernels]] pattern) — no UDF
  * serialization, stays inside whole-stage codegen.
  */
object MergeKernels {

  /** A rank-ordered merge batch, prebuilt per JVM into UTF8String
    * parallel arrays plus a nested lhs→(rhs→rank) lookup.
    */
  final class Batch(pairs: Array[(String, String)]) extends Serializable {
    @transient lazy val lhs: Array[UTF8String] =
      pairs.map(p => UTF8String.fromString(p._1))
    @transient lazy val rhs: Array[UTF8String] =
      pairs.map(p => UTF8String.fromString(p._2))
    @transient lazy val merged: Array[UTF8String] =
      pairs.map(p => UTF8String.fromString(p._1 + p._2))
    @transient lazy val rankOf: java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, Integer]] = {
      val m = new java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, Integer]]()
      var i = 0
      while (i < pairs.length) {
        m.computeIfAbsent(lhs(i), _ => new java.util.HashMap[UTF8String, Integer]())
          // first (lowest) rank wins if a pair were listed twice — the
          // trainer never emits duplicates, this is belt-and-braces
          .putIfAbsent(rhs(i), Integer.valueOf(i))
        i += 1
      }
      m
    }
    def size: Int = pairs.length
  }

  private def lookup(batch: Batch, a: UTF8String, b: UTF8String): Int = {
    val inner = batch.rankOf.get(a)
    if (inner == null) -1
    else {
      val r = inner.get(b)
      if (r == null) -1 else r.intValue()
    }
  }

  /** Apply the batch in rank order to one symbol array. Returns the
    * input ArrayData unchanged (no copy) when no batch pair occurs —
    * the overwhelmingly common case.
    */
  def applyBatch(arr: ArrayData, batch: Batch): ArrayData = {
    val n = arr.numElements()
    // the declared output type is array<string> containsNull=false and
    // upstream types (e.g. regexp_extract_all) carry containsNull=true,
    // so a null element must fail loudly here, not NPE downstream —
    // including on the n==1 / empty-batch fast path, which still flows
    // the array out under the containsNull=false contract
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        s"merge_batch_apply: null symbol at position $i — symbol arrays must not contain null elements")
      i += 1
    }
    if (n < 2 || batch.size == 0) return arr
    val syms = new Array[UTF8String](n)
    i = 0
    while (i < n) {
      syms(i) = arr.getUTF8String(i)
      i += 1
    }
    // presence scan: which ranks occur at all
    val present = new Array[Boolean](batch.size)
    var any = false
    i = 0
    while (i < n - 1) {
      val r = lookup(batch, syms(i), syms(i + 1))
      if (r >= 0) { present(r) = true; any = true }
      i += 1
    }
    if (!any) return arr
    var len = n
    var rank = 0
    while (rank < batch.size) {
      if (present(rank)) {
        val a = batch.lhs(rank); val b = batch.rhs(rank); val m = batch.merged(rank)
        var w = 0; var rd = 0; var appliedHere = false
        while (rd < len) {
          if (rd + 1 < len && syms(rd).equals(a) && syms(rd + 1).equals(b)) {
            // greedy-leftmost: consume both, never rematch the merged
            // cell as this rank's lhs (merged == lhs is impossible,
            // rhs is non-empty)
            syms(w) = m; rd += 2; appliedHere = true
          } else { syms(w) = syms(rd); rd += 1 }
          w += 1
        }
        if (appliedHere) {
          len = w
          // merges create new adjacencies; mark any LATER ranks they
          // form (earlier ranks stay unmerged this pass by contract)
          var j = 0
          while (j < len - 1) {
            val rr = lookup(batch, syms(j), syms(j + 1))
            if (rr > rank) present(rr) = true
            j += 1
          }
        }
      }
      rank += 1
    }
    new GenericArrayData(
      java.util.Arrays.copyOf(syms.asInstanceOf[Array[AnyRef]], len))
  }
}

/** `merge_batch_apply(syms)` for a fixed rank-ordered merge batch — see
  * [[MergeKernels]] for semantics. Input arrays must not contain null
  * elements (symbol tables never do); a null element fails loudly in
  * [[MergeKernels.applyBatch]] rather than NPE-ing, since upstream
  * array types routinely carry `containsNull = true`.
  */
case class MergeBatchApply(child: Expression, pairs: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "merge_batch_apply"

  @transient private lazy val batch = new MergeKernels.Batch(pairs.toArray)

  override def nullSafeEval(a: Any): Any =
    MergeKernels.applyBatch(a.asInstanceOf[ArrayData], batch)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val bRef = ctx.addReferenceObj("mergeBatch", batch,
        classOf[MergeKernels.Batch].getName)
      s"${ev.value} = graft.functions.MergeKernels.applyBatch($arr, $bRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): MergeBatchApply =
    copy(child = newChild)
}

object MergeBatchApply {
  /** Column API: apply a rank-ordered merge batch to a symbol-array
    * column.
    */
  def apply(syms: Column, pairs: Seq[(String, String)]): Column =
    ColumnBridge.column(
      MergeBatchApply(ColumnBridge.expression(syms), pairs))
}
