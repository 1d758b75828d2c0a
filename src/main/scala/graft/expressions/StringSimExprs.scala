package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static Jaro-Winkler kernel shared by interpreted eval and generated code.
  *
  * Operates on the raw UTF-8 BYTES of each string (not codepoints): that is
  * what DuckDB's `jaro_winkler_similarity` does (fuzz-verified against it on
  * 6k random pairs incl. multi-byte inputs — accented/CJK pairs only agree
  * under byte semantics), it needs no decode pass, and for the
  * record-linkage blocking keys this verifier runs on (names, tickers,
  * addresses) the byte and codepoint answers coincide on ASCII anyway.
  *
  * Exact rule (the strsim/DuckDB variant):
  *   - either side empty → 0.0 (including BOTH empty — not 1.0);
  *   - byte-identical → 1.0;
  *   - Jaro: match window `max(l1,l2)/2 - 1` (floored at 0), greedy
  *     left-to-right matching, half-transpositions;
  *   - Winkler boost ONLY when jaro > 0.7: up to 4 common prefix bytes,
  *     scaling 0.1.
  */
object JaroWinklerImpl {

  def sim(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (java.util.Arrays.equals(s1, s2)) return 1.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    val halfT = t / 2
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - halfT) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var ell = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (ell < maxP && s1(ell) == s2(ell)) ell += 1
    jaro + ell * 0.1 * (1.0 - jaro)
  }
}

/** `jaro_winkler(s1, s2)` — native codegen'd string similarity.
  *
  * Spark ships `levenshtein` but no Jaro-Winkler, and record-linkage
  * verification wants both: Levenshtein punishes length differences that
  * JW's prefix weighting forgives (the "Smith Holdings" vs "Smith Holdings
  * LLC" shape in the reference's symbol universe,
  * `estimate-extract.rkt:57-76`). The expression is a thin wrapper over
  * [[JaroWinklerImpl.sim]]: `defineCodeGen` emits a single static call, so
  * the whole comparison stays inside whole-stage codegen exactly like the
  * built-in `levenshtein` does. Like every pair verifier in this repo it is
  * meant to run on BLOCKED candidate pairs (an equi-join on a blocking key),
  * never all-pairs.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects two string columns, got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.JaroWinklerImpl.sim($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}
