package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite the declarative higher-order-function vector
  * kernels
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0d, (acc, v) => acc + v) }}}
  * {{{ aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), 0.0d, (acc, v) => acc + v) }}}
  *
  * (with optional float→double casts inside the element lambda) into the
  * native codegen kernels [[DotProduct]] / [[SquaredDistance]],
  * eliminating both the intermediate zip_with array allocation and the
  * interpreted per-element lambda evaluation. Users who write the
  * idiomatic HOF forms get the fast path automatically.
  *
  * Scope guard: only fires when both operands are `array<float|double>`.
  * The rewrite emits the kernels in `hofCompat` mode, which reproduces
  * the HOF form's null semantics exactly — unequal array lengths or a
  * null element yield NULL (as `zip_with`'s null-padding does) — so the
  * session-wide rule can never change a user query's result. The
  * unguarded fast paths (common-prefix sum, no per-element null checks)
  * stay behind the explicit [[VectorExprs.dot]] / [[VectorExprs.sqdist]]
  * APIs.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  /** the lambda var itself, or a cast of it to double */
  private def isVarOrDCast(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case c: Cast if c.dataType == DoubleType => isVar(c.child, v)
    case _ => isVar(e, v)
  }

  /** `x − y` over the lambda vars (either var optionally double-cast),
    * itself optionally double-cast.
    */
  private def isSubXY(e: Expression, x: NamedLambdaVariable,
                      y: NamedLambdaVariable): Boolean = e match {
    case c: Cast if c.dataType == DoubleType => isSubXY(c.child, x, y)
    case Subtract(l, r, _) => isVarOrDCast(l, x) && isVarOrDCast(r, y)
    case _ => false
  }

  private def vecType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** the element lambda body, matched to a kernel: `x*y` → dot,
    * `(x−y)*(x−y)` (or `(y−x)*(y−x)`) → squared distance.
    */
  private def kernelFor(body: Expression, x: NamedLambdaVariable,
                        y: NamedLambdaVariable, a: Expression,
                        b: Expression): Option[Expression] = body match {
    case mul: Multiply
        if (isSubXY(mul.left, x, y) && isSubXY(mul.right, x, y)) ||
          (isSubXY(mul.left, y, x) && isSubXY(mul.right, y, x)) =>
      Some(SquaredDistance(a, b, hofCompat = true))
    case mul: Multiply
        if (isVarOrDCast(mul.left, x) && isVarOrDCast(mul.right, y)) ||
          (isVarOrDCast(mul.left, y) && isVarOrDCast(mul.right, x)) =>
      Some(DotProduct(a, b, hofCompat = true))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(body,
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(add: Add,
            Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
        if vecType(a.dataType) && vecType(b.dataType) &&
          ((isVar(add.left, acc) && isVar(add.right, el)) ||
            (isVar(add.left, el) && isVar(add.right, acc))) &&
          isVar(fin, fv) =>
        kernelFor(body, x, y, a, b).getOrElse(agg)
    }
}
