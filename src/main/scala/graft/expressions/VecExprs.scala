package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product of two `array<double>` columns.
  *
  * Semantically identical to the declarative
  * `aggregate(zip_with(a, b, (x, y) => x * y), 0d, (acc, x) => acc + x)`
  * (same left-to-right summation order, so bit-identical doubles): NULL when
  * either input is NULL, lengths differ (zip_with pads the short side with
  * NULL, poisoning the sum), or any element is NULL.
  *
  * Why an Expression and not the fold: Spark's higher-order functions are
  * not codegen'd — each evaluation interprets two lambdas and allocates an
  * intermediate array per row (per PAIR in a similarity self-join). This is
  * a `doGenCode` loop over the two `ArrayData` with no allocation, inlined
  * into whole-stage codegen, which is exactly the hot path of
  * [[graft.operators.Similarity]] at corpus scale.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // manual check (ExpectsInputTypes' AbstractDataType is private[sql]):
  // both sides must already be array<double> — no implicit cast, callers
  // widen float embeddings explicitly
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects (array<double>, array<double>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  // null elements / length mismatch produce NULL even for non-null inputs
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

/** Native squared L2 norm of an `array<double>` column — `vec_dot(v, v)`
  * without evaluating the child twice. Same null semantics as [[VecDot]]. */
case class VecNormSq(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"vec_norm_sq expects array<double>, got $t")
    }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getDouble(i)
      s += v * v
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final double $v = $a.getDouble($i);
         |  $s += $v * $v;
         |}
         |if (!${ev.isNull}) { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecNormSq =
    copy(child = newChild)

  override def prettyName: String = "vec_norm_sq"
}
