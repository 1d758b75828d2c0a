package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge => B}
import org.apache.spark.sql.functions.sqrt

/** Column-API front for the native vector expressions — usable without any
  * session configuration (no function-registry dependency). Inputs must
  * already be `array<double>` (cast `array<float>` embeddings first; there
  * is deliberately no implicit cast). */
object VecFns {

  /** Codegen'd dot product of two `array<double>` columns. */
  def dot(a: Column, b: Column): Column =
    B.column(VecDot(B.expression(a), B.expression(b)))

  /** Codegen'd squared L2 norm. */
  def normSq(v: Column): Column =
    B.column(VecNormSq(B.expression(v)))

  /** L2 norm (`sqrt` of the native squared norm). */
  def norm(v: Column): Column = sqrt(normSq(v))

  /** KMV distinct-count sketch over a [0,1) hash-fraction column — O(k)
    * mergeable buffer, deterministic estimate (see [[KmvDistinct]]). */
  def kmvDistinct(hashFrac: Column, k: Int): Column =
    B.column(KmvDistinct(B.expression(hashFrac), k).toAggregateExpression())

  /** Elementwise vector sum aggregate — O(groups × dims) through the
    * shuffle, the centroid-math primitive (see [[VecSumAgg]]). */
  def vecSum(v: Column): Column =
    B.column(VecSumAgg(B.expression(v)).toAggregateExpression())

  /** Codegen'd Unicode NFC normalization with a zero-copy ASCII fast
    * path (see [[NormalizeNfc]]). */
  def nfc(s: Column): Column =
    B.column(NormalizeNfc(B.expression(s)))

  /** Codegen'd Jaro-Winkler similarity over UTF-8 bytes (see
    * [[JaroWinkler]]); DuckDB-parity semantics. */
  def jaroWinkler(a: Column, b: Column): Column =
    B.column(JaroWinkler(B.expression(a), B.expression(b)))
}
