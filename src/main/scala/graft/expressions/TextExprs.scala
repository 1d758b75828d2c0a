package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization of a string column.
  *
  * The first stage of every text-curation pipeline (ftfy-style fixing):
  * canonically compose combining sequences (`e` + U+0301 → `é`) so that
  * visually identical text is byte-identical BEFORE any hash-based
  * operator runs — exact dedup (dd1), MinHash shingles (dd2), winnowing
  * fingerprints (tx5) and the embedding hash (emb1) all key on bytes, and
  * un-normalized duplicates silently miss every one of them.
  *
  * Spark has no built-in for this (`lower`/`translate` don't compose
  * combining marks), so it is a `doGenCode` expression around
  * `java.text.Normalizer` with a zero-copy fast path: NFC is the identity
  * on pure-ASCII strings, and `UTF8String.isFullAscii()` is a vectorized
  * byte scan — at corpus scale the overwhelmingly-ASCII majority of rows
  * never round-trips through a Java String. DuckDB's `nfc_normalize`
  * implements the same Unicode canonical composition, which is what makes
  * the tx16 oracle grade byte-exact.
  */
case class NormalizeNfc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string column, got $t")
  }

  override def dataType: DataType = child.dataType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (s.isFullAscii) s
    else UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""$c.isFullAscii() ? $c :
         |org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.NFC))""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}
