package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{KmvDistinct, VecDot, VecDotRewrite, VecNormSq}

/** Session extensions: registers the native vector expressions so SQL users
  * get `vec_dot(a, b)` / `vec_norm_sq(v)` alongside the Column API in
  * [[graft.expressions.VecFns]], and injects [[VecDotRewrite]] so the
  * equivalent declarative `aggregate(zip_with(...))` fold is optimized into
  * them automatically. Enable with
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => VecDotRewrite)
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_norm_sq"),
      new ExpressionInfo(classOf[VecNormSq].getName, "vec_norm_sq"),
      (args: Seq[Expression]) => VecNormSq(args.head)))
    ext.injectFunction((
      FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[KmvDistinct].getName, "kmv_distinct"),
      (args: Seq[Expression]) =>
        KmvDistinct(args.head,
          args(1).eval().asInstanceOf[Number].intValue)
          .toAggregateExpression()))
  }
}
