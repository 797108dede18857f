package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp rolling hash over a string's UTF-8 bytes:
  * `h = Σ bytes[i] · B^(n-1-i)  mod M` with the classic `B = 31`,
  * `M = 1e9+7`, computed as the streaming recurrence
  * `h ← (h·B + byte) mod M`. Order-sensitive (a transposition changes
  * the hash), single codegen loop, no allocation.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string operand, got ${child.dataType.sql}")

  override def dataType: DataType = LongType

  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31L + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hashUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Static helper the generated code calls (keeps codegen a one-liner). */
  def hashUtf8(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31L + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    h
  }
}

/** Unicode NFC normalization (java.text.Normalizer — JDK-standard,
  * portable): composes decomposed sequences ("e" + COMBINING ACUTE →
  * "é") so visually identical text hashes/dedups identically — stage 0
  * of any multilingual corpus pipeline, ahead of lowercasing and
  * tokenization. Codegen via a one-line static call; already-NFC input
  * (the common case — includes all ASCII) short-circuits inside
  * Normalizer.isNormalized without allocating.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string operand, got ${child.dataType.sql}")

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static helper the generated code calls. Pure-ASCII input — the
    * dominant case, and always NFC by definition — is detected by a
    * raw byte scan for a high bit, so the common path allocates
    * NOTHING (no String decode); only non-ASCII rows pay the decode +
    * Normalizer check.
    */
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Byte-wise Hamming distance between two strings: count of differing
  * positions over the common prefix plus the length difference (so equal
  * strings are 0 and a missing suffix counts fully). The hot use is the
  * SimHash near-dup verify — 64-char '0'/'1' fingerprints — where this
  * replaces a split + zip_with + filter chain (three array allocations
  * per comparison) with one codegen'd byte loop.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string operands, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = IntegerType

  override def prettyName: String = "hamming"

  override def nullSafeEval(a: Any, b: Any): Any =
    HammingDistance.hammingUtf8(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HammingDistance.hammingUtf8($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {
  /** Static helper the generated code calls. */
  def hammingUtf8(a: UTF8String, b: UTF8String): Int = {
    val ba = a.getBytes
    val bb = b.getBytes
    val n = math.min(ba.length, bb.length)
    var d = math.abs(ba.length - bb.length)
    var i = 0
    while (i < n) {
      if (ba(i) != bb(i)) d += 1
      i += 1
    }
    d
  }
}

/** Sum of a string's Unicode code points — the codegen form of
  * `aggregate(split(s, ''), 0L, (acc, c) => acc + ascii(c))`, which
  * evaluates INTERPRETED and allocates a one-char-string array per token.
  * Matches that HOF exactly: `ascii` returns the first code point of each
  * single-char split cell (split's trailing empty cell contributes
  * `ascii('') = 0`), so summing code points is identical — and identical
  * to DuckDB's `list_sum(list_transform(regexp_split_to_array(s, ''),
  * c -> ascii(c)))`, keeping the oracle replayable.
  */
case class CharCodeSum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string operand, got ${child.dataType.sql}")

  override def dataType: DataType = LongType

  override def prettyName: String = "char_code_sum"

  override def nullSafeEval(input: Any): Any =
    CharCodeSum.sumCodePoints(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharCodeSum.sumCodePoints($c)")

  override protected def withNewChildInternal(newChild: Expression): CharCodeSum =
    copy(child = newChild)
}

object CharCodeSum {
  /** Static helper the generated code calls: decode UTF-8 in place and
    * sum code points — no split array, no per-char string objects.
    */
  def sumCodePoints(s: UTF8String): Long = {
    val str = s.toString
    var sum = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      sum += cp
      i += Character.charCount(cp)
    }
    sum
  }
}

/** Count of `left`'s elements that occur in the (small) `right` set —
  * the codegen form of `size(filter(arr, t => array_contains(set, t)))`,
  * which evaluates INTERPRETED and allocates a filtered array per row.
  * One pass over `left`, |set| string compares per element, no
  * allocation; null elements are not counted (matching the HOF form,
  * where a null predicate result drops the element). For large sets use
  * a broadcast anti/semi join instead — the set here is a handful of
  * marker words.
  */
case class CountInSet(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  private def strArray(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (strArray(left.dataType) && strArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> operands, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = LongType

  override def prettyName: String = "count_in_set"

  override def nullSafeEval(a: Any, b: Any): Any =
    CountInSet.countIn(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CountInSet.countIn($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountInSet =
    copy(left = newLeft, right = newRight)
}

object CountInSet {
  /** Static helper the generated code calls. */
  def countIn(values: org.apache.spark.sql.catalyst.util.ArrayData,
              set: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    var count = 0L
    var i = 0
    while (i < values.numElements()) {
      if (!values.isNullAt(i)) {
        val v = values.getUTF8String(i)
        var j = 0
        var found = false
        while (!found && j < set.numElements()) {
          if (!set.isNullAt(j) && v.equals(set.getUTF8String(j))) found = true
          j += 1
        }
        if (found) count += 1
      }
      i += 1
    }
    count
  }
}

object TextExprs {
  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))

  def rollingHash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))

  def countInSet(values: Column, set: Column): Column =
    ColumnBridge.column(
      CountInSet(ColumnBridge.expression(values), ColumnBridge.expression(set)))

  def hamming(a: Column, b: Column): Column =
    ColumnBridge.column(
      HammingDistance(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def charCodeSum(c: Column): Column =
    ColumnBridge.column(CharCodeSum(ColumnBridge.expression(c)))
}
