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
}
