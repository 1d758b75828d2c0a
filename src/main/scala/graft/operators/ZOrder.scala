package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimension clustering key.
  *
  * Interleaves the bits of two dimension values so that rows close in BOTH
  * dimensions land close in the one-dimensional sort order. Sorting (or
  * `repartitionByRange`-ing) a table by this key before writing gives every
  * file a tight min/max envelope in *both* dimensions at once, so min/max
  * data skipping (parquet row-group stats, partition-level zone maps) prunes
  * multi-predicate scans that a lexicographic sort can only prune on its
  * leading column. This is the layout step a 100 TB events table needs when
  * queries filter by user AND time: a (user, day) lexicographic sort leaves
  * every day-only probe scanning all files, while the z-order layout bounds
  * both probes.
  *
  * The key is pure integer bit-math on built-in expressions (shiftleft /
  * bitwise and-or), so it stays inside whole-stage codegen and is exactly
  * reproducible in any engine — the DuckDB oracle computes the identical
  * key from the same arithmetic.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` to even bit positions (0,2,4,…,30).
    * Classic Morton magic-number spread, unrolled over Spark built-ins. */
  private def spread16(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFF))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FF))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0F))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555))
  }

  /** Morton key of two non-negative dimension values (low 16 bits each):
    * bits of `a` on even positions, bits of `b` on odd. Result fits in a
    * non-negative 32-bit int range (returned as LongType via the bitwiseOR
    * of two ≤31-bit ints cast up). */
  def mortonKey(a: Column, b: Column): Column =
    spread16(a.cast("int")).cast("long")
      .bitwiseOR(shiftleft(spread16(b.cast("int")).cast("long"), 1))

  /** The identical spread as ANSI SQL text, for oracle parity. `x` must be
    * a SQL expression yielding a non-negative integer. */
  private def spreadSql(x: String): String = {
    val a = s"(($x) & 65535)"
    val b = s"((($a | ($a << 8)) & 16711935))"
    val c = s"((($b | ($b << 4)) & 252645135))"
    val d = s"((($c | ($c << 2)) & 858993459))"
    s"((($d | ($d << 1)) & 1431655765))"
  }

  /** SQL text of [[mortonKey]] over the given operand SQL fragments. The
    * odd-position operand is widened to BIGINT before its final shift —
    * `0x55555555 << 1` overflows a 32-bit int, and DuckDB (correctly)
    * errors on integer overflow rather than wrapping. */
  def mortonKeySql(a: String, b: String): String =
    s"(CAST(${spreadSql(a)} AS BIGINT) | (CAST(${spreadSql(b)} AS BIGINT) << 1))"

  /** Hilbert-curve index of an (a, b) cell on the 256×256 grid (values are
    * masked to 8 bits) — Morton's locality-superior sibling: consecutive
    * Hilbert indices are ALWAYS grid-adjacent (Morton jumps across the
    * plane at power-of-two boundaries), so range-partitioned files get
    * tighter per-file min/max envelopes on both dimensions.
    *
    * The classic xy2d bit walk (8 rounds of quadrant classification +
    * reflect/swap rotation) is expressed as an `aggregate` fold over the
    * power-of-two literal array — scan-side integer math, codegen'd, no
    * shuffle, engine-reproducible. Spark lambda-struct semantics evaluate
    * every field against the OLD accumulator; the SQL twin
    * ([[hilbertKeySql]]) uses LIST state because DuckDB struct-literal
    * lambdas update fields sequentially in place. */
  def hilbertKey(aSql: String, bSql: String): Column = expr(
    s"""aggregate(array(128, 64, 32, 16, 8, 4, 2, 1),
       |  named_struct('x', CAST(($aSql) AS INT) & 255,
       |               'y', CAST(($bSql) AS INT) & 255,
       |               'd', CAST(0 AS BIGINT)),
       |  (a, s) -> named_struct(
       |    'x', CASE WHEN (a.y & s) = 0
       |           THEN CASE WHEN (a.x & s) > 0 THEN s - 1 - a.y ELSE a.y END
       |           ELSE a.x END,
       |    'y', CASE WHEN (a.y & s) = 0
       |           THEN CASE WHEN (a.x & s) > 0 THEN s - 1 - a.x ELSE a.x END
       |           ELSE a.y END,
       |    'd', a.d + CAST(s AS BIGINT) * s *
       |         ((3 * (CASE WHEN (a.x & s) > 0 THEN 1 ELSE 0 END)) ^
       |          (CASE WHEN (a.y & s) > 0 THEN 1 ELSE 0 END))),
       |  acc -> acc.d)""".stripMargin)

  /** [[hilbertKey]] as DuckDB SQL. State rides a BIGINT LIST
    * [x, y, d, s] (struct literals would see in-place-updated fields). */
  def hilbertKeySql(a: String, b: String): String =
    s"""list_reduce(
       |  list_prepend([CAST((($a) & 255) AS BIGINT),
       |                CAST((($b) & 255) AS BIGINT),
       |                CAST(0 AS BIGINT), CAST(0 AS BIGINT)],
       |    list_transform([128, 64, 32, 16, 8, 4, 2, 1], s ->
       |      [CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
       |       CAST(s AS BIGINT)])),
       |  (a, e) -> [
       |    CASE WHEN (a[2] & e[4]) = 0
       |         THEN CASE WHEN (a[1] & e[4]) > 0 THEN e[4] - 1 - a[2]
       |              ELSE a[2] END
       |         ELSE a[1] END,
       |    CASE WHEN (a[2] & e[4]) = 0
       |         THEN CASE WHEN (a[1] & e[4]) > 0 THEN e[4] - 1 - a[1]
       |              ELSE a[1] END
       |         ELSE a[2] END,
       |    a[3] + e[4] * e[4] *
       |      xor(3 * (CASE WHEN (a[1] & e[4]) > 0 THEN 1 ELSE 0 END),
       |          CASE WHEN (a[2] & e[4]) > 0 THEN 1 ELSE 0 END),
       |    CAST(0 AS BIGINT)])[3]""".stripMargin
}
