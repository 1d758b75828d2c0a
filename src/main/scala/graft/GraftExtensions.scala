package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{JaroWinkler, KmvDistinct, NormalizeNfc, VecDot, VecDotRewrite, VecNormSq}

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
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // arity/foldability checked here so a malformed SQL call surfaces as an
    // analysis-time error message, not a builder IndexOutOfBounds/eval crash
    def arity(name: String, n: Int, args: Seq[Expression]): Unit =
      if (args.length != n) throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${args.length}")
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        arity("vec_dot", 2, args); VecDot(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_norm_sq"),
      new ExpressionInfo(classOf[VecNormSq].getName, "vec_norm_sq"),
      (args: Seq[Expression]) => {
        arity("vec_norm_sq", 1, args); VecNormSq(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NormalizeNfc].getName, "nfc_normalize"),
      (args: Seq[Expression]) => {
        arity("nfc_normalize", 1, args); NormalizeNfc(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (args: Seq[Expression]) => {
        arity("jaro_winkler", 2, args); JaroWinkler(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[KmvDistinct].getName, "kmv_distinct"),
      (args: Seq[Expression]) => {
        arity("kmv_distinct", 2, args)
        if (!args(1).foldable) throw new IllegalArgumentException(
          "kmv_distinct's k must be a literal")
        KmvDistinct(args.head, args(1).eval().asInstanceOf[Number].intValue)
          .toAggregateExpression()
      }))
  }
}
