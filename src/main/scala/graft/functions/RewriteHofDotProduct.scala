package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite the declarative higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0d, (acc, v) => acc + v) }}}
  *
  * (with optional float→double casts inside the multiply) into the native
  * codegen [[DotProduct]] kernel, eliminating the intermediate zip_with
  * array allocation per row. Users who write the idiomatic HOF form get
  * the fast path automatically.
  *
  * Scope guard: only fires when both operands are `array<float|double>`.
  * The rewrite emits [[DotProduct]] in `hofCompat` mode, which reproduces
  * the HOF form's null semantics exactly — unequal array lengths or a
  * null element yield NULL (as `zip_with`'s null-padding does) — so the
  * session-wide rule can never change a user query's result. The
  * unguarded fast path (common-prefix sum, no per-element null checks)
  * stays behind the explicit [[VectorExprs.dot]] API.
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

  private def vecType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(mul: Multiply,
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(add: Add,
            Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
        if vecType(a.dataType) && vecType(b.dataType) &&
          ((isVarOrDCast(mul.left, x) && isVarOrDCast(mul.right, y)) ||
            (isVarOrDCast(mul.left, y) && isVarOrDCast(mul.right, x))) &&
          ((isVar(add.left, acc) && isVar(add.right, el)) ||
            (isVar(add.left, el) && isVar(add.right, acc))) &&
          isVar(fin, fv) =>
        DotProduct(a, b, hofCompat = true)
    }
}
