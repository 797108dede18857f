package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path.
  *
  * The pure-Catalyst formulation (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * allocates an intermediate 64-element array per evaluated pair; inside an
  * all-pairs similarity join that allocation dominates the runtime. This
  * expression loops over the two `ArrayData` directly in generated code —
  * no intermediate array, stays inside whole-stage codegen.
  *
  * Accepts `array<float>` and `array<double>` operands in any combination
  * (multiplication is performed in double precision, matching what the
  * `cast("double")`-based HOF formulation computes).
  *
  * Two null-handling modes:
  *  - `hofCompat = false` (the explicit [[VectorExprs.dot]] API): the fast
  *    path — arrays are assumed fixed-dimension with non-null elements
  *    (embedding columns are); unequal lengths sum the common prefix.
  *  - `hofCompat = true` (what [[RewriteHofDotProduct]] emits): exact
  *    `aggregate(zip_with(...))` semantics — unequal lengths or any null
  *    element yield NULL, so the optimizer rewrite can never change a
  *    user query's result.
  */
case class DotProduct(left: Expression, right: Expression,
                      hofCompat: Boolean = false)
    extends BinaryExpression {

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> operands, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType

  // in hofCompat mode the result can be null even for non-null inputs
  // (length mismatch, null element)
  override def nullable: Boolean = hofCompat || super.nullable

  override def prettyName: String = if (hofCompat) "vec_dot_hof" else "vec_dot"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (hofCompat && x.numElements() != y.numElements()) return null
    val n = math.min(x.numElements(), y.numElements())
    val xf = elemIsFloat(left); val yf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (hofCompat && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names: several DotProducts can be inlined into one generated
      // method (e.g. dot(a,b) and the two hoisted norms in one projection)
      val n = ctx.freshName("vecDotN")
      val s = ctx.freshName("vecDotSum")
      val i = ctx.freshName("vecDotI")
      val xGet = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val yGet = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      if (!hofCompat)
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) { $s += $xGet * $yGet; }
           |${ev.value} = $s;
         """.stripMargin
      else
        s"""
           |if ($a.numElements() != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  int $n = $a.numElements();
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    $s += $xGet * $yGet;
           |  }
           |  if (!${ev.isNull}) { ${ev.value} = $s; }
           |}
         """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)² in a single codegen loop — the squared Euclidean distance
  * kernel. Same operand/null contract as [[DotProduct]]: `hofCompat =
  * false` is the fast explicit API (fixed-dimension non-null elements,
  * common-prefix sum on mismatch); `hofCompat = true` reproduces
  * `aggregate(zip_with(a,b,(x,y)=>(x−y)²),0,+)` null semantics exactly
  * (length mismatch or null element → NULL), which is what
  * [[RewriteHofDotProduct]] emits so the session-wide rewrite can never
  * change a user query's result.
  */
case class SquaredDistance(left: Expression, right: Expression,
                           hofCompat: Boolean = false)
    extends BinaryExpression {

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> operands, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = hofCompat || super.nullable

  override def prettyName: String = if (hofCompat) "vec_sqdist_hof" else "vec_sqdist"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (hofCompat && x.numElements() != y.numElements()) return null
    val n = math.min(x.numElements(), y.numElements())
    val xf = elemIsFloat(left); val yf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (hofCompat && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("sqDistN")
      val s = ctx.freshName("sqDistSum")
      val d = ctx.freshName("sqDistD")
      val i = ctx.freshName("sqDistI")
      val xGet = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val yGet = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      if (!hofCompat)
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $d = $xGet - $yGet;
           |  $s += $d * $d;
           |}
           |${ev.value} = $s;
         """.stripMargin
      else
        s"""
           |if ($a.numElements() != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  int $n = $a.numElements();
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    double $d = $xGet - $yGet;
           |    $s += $d * $d;
           |  }
           |  if (!${ev.isNull}) { ${ev.value} = $s; }
           |}
         """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistance =
    copy(left = newLeft, right = newRight)
}

/** Elementwise `aᵢ / s` in double precision — the codegen form of
  * `transform(a, x => x.cast("double") / s)` (interpreted), used for
  * vector normalization (`s` = the L2 norm). Null elements stay null;
  * a null scalar yields a null result (binary null-safety).
  */
case class ScaleArray(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okArray(left.dataType) && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, double), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType =
    ArrayType(DoubleType,
      left.dataType.asInstanceOf[ArrayType].containsNull)

  override def prettyName: String = "vec_scale"

  private def elemIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    ScaleArray.divide(a.asInstanceOf[ArrayData], b.asInstanceOf[Double], elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ScaleArray.divide($a, $b, $elemIsFloat);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ScaleArray =
    copy(left = newLeft, right = newRight)
}

object ScaleArray {
  /** Static helper the generated code calls. */
  def divide(arr: ArrayData, s: Double, isFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        out(i) = (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)) / s
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Symmetric int8 scalar quantization pack: `byteᵢ = round(aᵢ / s)` clamped
  * to [−127, 127], emitted as BINARY — 4× smaller than float32, the storage
  * form FAISS calls SQ8. `s` is the per-vector scale (max |aᵢ| / 127 at
  * encode time, materialized alongside the code so the decode is exact
  * arithmetic: `âᵢ = s·byteᵢ`). The clamp guards against a caller-supplied
  * scale tighter than max|a|/127 — saturation, not byte overflow.
  */
case class Sq8Pack(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okArray(left.dataType) && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, double), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = BinaryType

  override def prettyName: String = "sq8_pack"

  private def elemIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    Sq8Pack.pack(a.asInstanceOf[ArrayData], b.asInstanceOf[Double], elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Sq8Pack.pack($a, $b, $elemIsFloat);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8Pack =
    copy(left = newLeft, right = newRight)
}

object Sq8Pack {
  /** Static helper the generated code calls. */
  def pack(arr: ArrayData, s: Double, isFloat: Boolean): Array[Byte] = {
    val n = arr.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val v = (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)) / s
      val r = math.round(v)
      out(i) = (if (r > 127L) 127L else if (r < -127L) -127L else r).toByte
      i += 1
    }
    out
  }
}

/** Σ aᵢ·byteᵢ in double precision — the asymmetric float×int8 inner-product
  * kernel (query stays float, corpus is SQ8-packed BINARY; multiply the
  * result by the code's scale to recover the approximate dot). Signed
  * bytes, single codegen loop over the raw byte[] — no unpack allocation.
  * Length mismatch sums the common prefix (same fast-path contract as
  * [[DotProduct]]).
  */
case class DotI8(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okArray(left.dataType) && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, binary), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot_i8"

  private def elemIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.numElements(), y.length)
    val xf = elemIsFloat
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      s += xv * y(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("dotI8N")
      val s = ctx.freshName("dotI8Sum")
      val i = ctx.freshName("dotI8I")
      val xGet = if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.length);
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $s += $xGet * (double) $b[$i]; }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotI8 =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Σ aᵢ·bᵢ in double precision, single codegen loop (fast path: non-null
    * fixed-dimension elements assumed — the engine's own vector columns).
    */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Elementwise divide-by-scalar (vector normalization), codegen. */
  def scale(a: Column, s: Column): Column =
    ColumnBridge.column(ScaleArray(
      ColumnBridge.expression(a), ColumnBridge.expression(s)))

  /** Σ (aᵢ−bᵢ)² in double precision, single codegen loop (fast path, same
    * contract as [[dot]]).
    */
  def sqdist(a: Column, b: Column): Column =
    ColumnBridge.column(SquaredDistance(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Symmetric int8 pack: `round(aᵢ/s)` clamped to [−127,127] as BINARY. */
  def sq8Pack(a: Column, s: Column): Column =
    ColumnBridge.column(Sq8Pack(
      ColumnBridge.expression(a), ColumnBridge.expression(s)))

  /** Σ aᵢ·byteᵢ — asymmetric float×int8 inner product over a BINARY code. */
  def dotI8(a: Column, code: Column): Column =
    ColumnBridge.column(DotI8(
      ColumnBridge.expression(a), ColumnBridge.expression(code)))
}
