package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Greedy maximal-marginal-relevance selection over a pooled candidate
  * array — the diversified re-rank a retrieval pipeline runs AFTER the
  * contraction (dense/lexical top-N), so near-duplicate hits don't crowd
  * the final page.
  *
  * Consumes exactly the [[TopKBy]] output shape
  * `array<struct<ord, tie, payload>>` with `ord` = relevance (rounded to
  * 6dp upstream for the engine-portable pool cut), `tie` = candidate id,
  * `payload` = the candidate's embedding. Emits the first `k` picks in
  * selection order as `array<struct<tie, mmr>>`:
  *
  *   mmr_i = λ·rel_i − (1−λ)·max_{s∈selected} cos(v_i, v_s)
  *
  * with the max over the empty set = 0 (pick 1 is pure relevance) and
  * ties broken by smaller `tie`. Scores are computed in INTEGER
  * micro-units — λ quantized to 3dp (λₙ = round(λ·1000)), relevance and
  * cosines to 6dp (`round(x·1e6)` as longs), so every score is exactly
  * `λₙ·relµ − (1000−λₙ)·simµ` with NO floating-point rounding in any
  * comparison. This matters because λ·(6dp value) is a 7-decimal-digit
  * number whose 6dp rounding lands on exact halves constantly — the one
  * case where JVM (`BigDecimal` of the shortest repr, HALF_UP) and SQL
  * engines (`round` on the binary double) systematically disagree.
  * Integer scoring is what makes an independent SQL engine replay the
  * identical selection AND the identical reported score
  * (`score / 1e9`, an exact integer-to-double conversion both sides).
  *
  * Scale posture: MMR is inherently sequential per query, so the right
  * distributed shape is pool-then-select — `top_k_by` contracts each
  * query's candidates map-side to a bounded heap (shuffle ≤ poolK rows
  * per query), and this expression runs once per QUERY row on ≤ poolK
  * entries. It is deliberately a `CodegenFallback`: it executes on the
  * post-contraction rows (one per query), never on the corpus, so
  * codegen would buy nothing.
  */
case class MmrSelect(pool: Expression, kExpr: Expression, lambdaExpr: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(pool, kExpr, lambdaExpr)

  // total at construction (analyzer rebuilds mid-resolution); validation
  // lives in checkInputDataTypes
  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue
  private lazy val lambda: Double = lambdaExpr.eval().asInstanceOf[Number].doubleValue

  private def poolStruct: Option[StructType] = pool.dataType match {
    case ArrayType(st: StructType, _) if st.length == 3 => Some(st)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = poolStruct match {
    case _ if !kExpr.foldable || !lambdaExpr.foldable =>
      TypeCheckResult.TypeCheckFailure("mmr_select: k and lambda must be literals")
    case _ if kExpr.eval() == null || lambdaExpr.eval() == null =>
      TypeCheckResult.TypeCheckFailure("mmr_select: k and lambda must be non-null")
    // range-check the foldables at ANALYSIS time: a negative k would
    // throw NegativeArraySizeException mid-job, and a lambda outside
    // [0,1] silently flips the redundancy penalty into a bonus
    // (1000 - lamNum goes negative)
    case _ if k < 0 =>
      TypeCheckResult.TypeCheckFailure(s"mmr_select: k must be >= 0, got $k")
    case _ if lambda.isNaN || lambda < 0.0 || lambda > 1.0 =>
      TypeCheckResult.TypeCheckFailure(
        s"mmr_select: lambda must be in [0, 1], got $lambda")
    case Some(st) =>
      val relOk = st(0).dataType.isInstanceOf[NumericType]
      val tieOk = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(st(1).dataType)
      val vecOk = st(2).dataType match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      }
      if (relOk && tieOk && vecOk) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"mmr_select: pool must be array<struct<numeric, orderable, array<float|double>>>, " +
          s"got ${pool.dataType.catalogString}")
    case None => TypeCheckResult.TypeCheckFailure(
      s"mmr_select: pool must be the top_k_by shape array<struct<ord, tie, payload>>, " +
        s"got ${pool.dataType.catalogString}")
  }

  private lazy val st = poolStruct.get
  private lazy val tieType: DataType = st(1).dataType
  private lazy val vecIsFloat: Boolean =
    st(2).dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val tieOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(tieType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tie", tieType, nullable = false),
    StructField("mmr", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean = pool.nullable

  override def eval(input: InternalRow): Any = {
    val arr = pool.eval(input)
    if (arr == null) return null
    val a = arr.asInstanceOf[ArrayData]
    val n = a.numElements()

    val lamNum: Long = math.round(lambda * 1000.0) // λ quantized to 3dp
    val relU = new Array[Long](n) // relevance in 1e-6 units
    val tie = new Array[Any](n)
    val vec = new Array[Array[Double]](n)
    val nrm = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = a.getStruct(i, 3)
      relU(i) = math.round(
        row.get(0, st(0).dataType).asInstanceOf[Number].doubleValue() * 1e6)
      tie(i) = InternalRow.copyValue(row.get(1, tieType))
      val v = row.getArray(2)
      val d = v.numElements()
      val out = new Array[Double](d)
      var s = 0.0
      var j = 0
      while (j < d) {
        out(j) = if (vecIsFloat) v.getFloat(j).toDouble else v.getDouble(j)
        s += out(j) * out(j)
        j += 1
      }
      vec(i) = out
      nrm(i) = math.sqrt(s)
      i += 1
    }

    // cosine between pool members in 1e-6 integer units — a zero-norm
    // vector contributes similarity 0 (no direction to be redundant with)
    def simU(x: Int, y: Int): Long = {
      val den = nrm(x) * nrm(y)
      if (den == 0.0) 0L
      else {
        var s = 0.0
        val d = math.min(vec(x).length, vec(y).length)
        var j = 0
        while (j < d) { s += vec(x)(j) * vec(y)(j); j += 1 }
        math.round(s / den * 1e6)
      }
    }

    val taken = new Array[Boolean](n)
    // max cosine to the selected set so far — the TRUE max, which is
    // negative for candidates anti-correlated with everything selected
    // (clamping at 0 would erase that diversity credit); MinValue marks
    // "no selected sims yet", whose penalty term is 0 by MMR convention
    val maxSimU = Array.fill(n)(Long.MinValue)
    val picks = math.min(k, n)
    val out = new Array[Any](picks)
    var p = 0
    while (p < picks) {
      var best = -1
      var bestScore = 0L
      var c = 0
      while (c < n) {
        if (!taken(c)) {
          val ms = if (maxSimU(c) == Long.MinValue) 0L else maxSimU(c)
          // exact: score in 1e-9 units, no float rounding anywhere
          val score = lamNum * relU(c) - (1000L - lamNum) * ms
          if (best < 0 || score > bestScore ||
            (score == bestScore && tieOrdering.compare(tie(c), tie(best)) < 0)) {
            best = c
            bestScore = score
          }
        }
        c += 1
      }
      taken(best) = true
      // exact integer→double conversion (|score| ≤ 1e9 ≪ 2^53): both
      // engines report the identical mmr double
      out(p) = new GenericInternalRow(Array[Any](tie(best), bestScore.toDouble / 1e9))
      // incremental max-sim update: one O(n) pass per pick, O(poolK²)
      // total — never rescans the selected set
      c = 0
      while (c < n) {
        if (!taken(c)) {
          val s = simU(c, best)
          if (s > maxSimU(c)) maxSimU(c) = s
        }
        c += 1
      }
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MmrSelect =
    copy(pool = newChildren(0), kExpr = newChildren(1), lambdaExpr = newChildren(2))

  override def prettyName: String = "mmr_select"
}

object MmrSelect {

  /** Column builder: greedy MMR over a [[TopKBy]]-shaped pool. */
  def mmrSelect(pool: Column, k: Int, lambda: Double): Column =
    ColumnBridge.column(
      MmrSelect(ColumnBridge.expression(pool), Literal(k), Literal(lambda)))
}
