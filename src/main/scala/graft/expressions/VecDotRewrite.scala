package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrites the declarative dot-product fold
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, x) -> acc + x)
  *
  * into the native codegen'd [[VecDot]] (and the `zip_with(v, v, ...)`
  * self-product into [[VecNormSq]]). The fold is how a DataFrame/SQL user
  * naturally writes a dot product, but Spark's higher-order functions are
  * interpreted per row with an intermediate array allocation; the rewrite is
  * safe because VecDot is bit-identical (same summation order, same null
  * semantics — proven in VecExprsSpec) and turns the pattern into a fused
  * whole-stage-codegen loop.
  *
  * Guards: both inputs `array<double>`, multiply over exactly the two
  * zip_with lambda variables, zero literal `0.0d`, merge `acc + x` over the
  * two merge variables, identity finish. Anything else is left alone.
  */
object VecDotRewrite extends Rule[LogicalPlan] {

  private def isVars(e1: Expression, e2: Expression,
                     v1: NamedLambdaVariable, v2: NamedLambdaVariable): Boolean =
    (e1, e2) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        // either order: double * and + are commutative (incl. NULL behavior)
        (a.exprId == v1.exprId && b.exprId == v2.exprId) ||
          (a.exprId == v2.exprId && b.exprId == v1.exprId)
      case _ => false
    }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Positive zero only: Scala's `0.0 == -0.0` is true, but an empty-array
    * fold over a -0.0 seed returns -0.0 while VecDot returns 0.0 — the
    * rewrite must not touch that (bit-identity guarantee). */
  private def isPosZero(e: Expression): Boolean = e match {
    case Literal(v: Double, DoubleType) =>
      java.lang.Double.doubleToRawLongBits(v) == 0L
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(mx, my, _),
                Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
            zero,
            LambdaFunction(Add(aa, ae, _),
              Seq(macc: NamedLambdaVariable, mel: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable,
              Seq(fv: NamedLambdaVariable), _))
          if isPosZero(zero) && isDoubleArray(a) && isDoubleArray(b) &&
            isVars(mx, my, zx, zy) && isVars(aa, ae, macc, mel) &&
            fin.exprId == fv.exprId =>
        if (a.semanticEquals(b)) VecNormSq(a) else VecDot(a, b)
    }
}
