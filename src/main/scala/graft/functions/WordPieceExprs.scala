package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen WordPiece greedy longest-match-first segmentation (Schuster &
  * Nakajima, ICASSP 2012; the BERT tokenizer's apply rule, Devlin et al.
  * 2019 §C): at each position take the LONGEST vocabulary piece matching
  * the remaining suffix; if none matches, the whole word becomes the
  * `[UNK]` token. Continuation pieces (every piece after the first) are
  * emitted with the conventional `##` prefix when `mark` is set — a
  * display marking only, vocabulary pieces themselves are stored
  * position-agnostic (the SentencePiece-style variant; BERT's
  * position-split vocabulary is a training-time convention, not an apply
  * constraint — deviation documented in SURVEY §7.2's spirit).
  *
  * The vocabulary rides the plan as a reference object
  * (`ctx.addReferenceObj`, the [[CenterKernels]] pattern): shipped once
  * per stage with the task binary, prebuilt into a length-bucketed hash
  * set on first use per JVM — no per-row closure, no UDF serialization,
  * and the expression stays inside whole-stage codegen. Lookup cost is
  * O(maxPieceLen) set probes per consumed position.
  *
  * Intended use is on the DISTINCT-WORD table (vocab-sized), never the
  * raw corpus — [[graft.text.WordPiece.tokenize]] joins the per-word
  * segmentation back onto the exploded corpus, the same
  * precompute-then-join shape as [[graft.text.Bpe.tokenize]].
  */
object WordPieceKernels {

  /** Prebuilt lookup: the piece set plus the longest piece length (the
    * greedy scan's upper bound). Built once per expression instance /
    * codegen reference, reused across rows.
    */
  final class Vocab(pieces: Seq[String]) extends Serializable {
    @transient lazy val set: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String](pieces.length * 2)
      pieces.foreach(s.add)
      s
    }
    @transient lazy val maxLen: Int =
      if (pieces.isEmpty) 0 else pieces.iterator.map(_.length).max
  }

  private val Unk = UTF8String.fromString("[UNK]")

  /** Greedy longest-match split of one word. Returns the piece array
    * (marked with `##` on continuations when `mark`), or a singleton
    * `[UNK]` when any position has no matching piece — the BERT rule:
    * an un-tokenizable word is unknown as a WHOLE, partial prefixes are
    * not emitted.
    */
  def split(word: UTF8String, vocab: Vocab, mark: Boolean): ArrayData = {
    val s = word.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any](4)
    var pos = 0
    while (pos < n) {
      var l = math.min(vocab.maxLen, n - pos)
      var hit = -1
      while (l >= 1 && hit < 0) {
        if (vocab.set.contains(s.substring(pos, pos + l))) hit = l
        else l -= 1
      }
      if (hit < 0) return new GenericArrayData(Array[Any](Unk))
      val piece = s.substring(pos, pos + hit)
      out += UTF8String.fromString(
        if (mark && pos > 0) "##" + piece else piece)
      pos += hit
    }
    new GenericArrayData(out.toArray)
  }
}

/** `wordpiece_split(word)` over a fixed vocabulary — see
  * [[WordPieceKernels]] for semantics.
  *
  * `pieces` is a Seq, NOT an Array: case-class equality on an Array
  * field is identity-based, which would make two semantically identical
  * expressions never compare equal — breaking Catalyst canonicalization
  * and common-subexpression dedup for this node.
  */
case class WordPieceSplit(child: Expression, pieces: Seq[String],
                          mark: Boolean) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_split"

  @transient private lazy val vocab = new WordPieceKernels.Vocab(pieces)

  override def nullSafeEval(w: Any): Any =
    WordPieceKernels.split(w.asInstanceOf[UTF8String], vocab, mark)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, wrd => {
      val vRef = ctx.addReferenceObj("wpVocab", vocab,
        classOf[WordPieceKernels.Vocab].getName)
      s"${ev.value} = graft.functions.WordPieceKernels.split($wrd, $vRef, $mark);"
    })

  override protected def withNewChildInternal(newChild: Expression): WordPieceSplit =
    copy(child = newChild)
}

object WordPieceSplit {
  /** Column API: greedy WordPiece pieces of a string column. */
  def split(word: Column, pieces: Seq[String], mark: Boolean = true): Column =
    ColumnBridge.column(
      WordPieceSplit(ColumnBridge.expression(word), pieces, mark))
}
