package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands interval coalescing.
  *
  * Merges overlapping / touching per-key time intervals into maximal
  * "islands" — the classic warehouse shape behind sessionization-by-overlap,
  * validity-interval compaction, and downtime/uptime reports. The reference's
  * calendar loaders reason over per-symbol date spans the same way
  * (`earnings-calendar-transform-load.rkt:84,128` derives a symbol's
  * retraction window / coverage horizon from interval arithmetic over its
  * dates — this operator is that span derivation as a reusable step).
  *
  * Algorithm (one shuffle, one sort, zero joins):
  *   1. per key, order intervals by (start, tieBreak);
  *   2. running max of `end` over all PRIOR rows; a row opens a new island
  *      iff its start is strictly greater than that running max (touching
  *      intervals — start == prior end — merge, matching half-open
  *      [start, end) semantics);
  *   3. the running count of island-opens is the island id; a groupBy on
  *      (key, islandId) yields each island's span and membership.
  *
  * Scale: state never leaves the per-key window — the plan is one hash
  * exchange on `key` + one sort, then a partial-aggregated groupBy on the
  * SAME key prefix (no second shuffle). Skewed keys are bounded by the
  * window sort, not by memory: no per-key state accumulates beyond the sort
  * spill. This survives 100 TB the same way every w1/w2 window does.
  */
object Intervals {

  /** Coalesce per-key intervals `[startCol, endCol)` into islands.
    *
    * Returns one row per island: key, island_start, island_end, n_rows.
    * `tieBreak` must make the ordering total so the island ids are
    * deterministic across engines.
    */
  def coalesceIntervals(
      df: DataFrame,
      key: String,
      startCol: String,
      endCol: String,
      tieBreak: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(startCol), col(tieBreak))
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__prior_max_end", max(col(endCol)).over(prior))
      .withColumn("__opens",
        when(col("__prior_max_end").isNull ||
          col(startCol) > col("__prior_max_end"), 1).otherwise(0))
      .withColumn("island_id", sum(col("__opens")).over(run))
      .groupBy(col(key), col("island_id"))
      .agg(
        min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_rows"))
  }
}
