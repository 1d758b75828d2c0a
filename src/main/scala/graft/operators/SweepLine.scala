package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval sweep-line primitives: running concurrency over closed integer
  * intervals — the load/occupancy question behind connection-pool sizing,
  * peak-QPS capacity planning, and Little's-law audits.
  */
object SweepLine {

  /** Running concurrency over `[s, e]` closed integer intervals (epoch
    * seconds, slot ids, ...): each interval contributes `+1` at `t = s` and
    * `-1` at `t = e + 1`; the running sum of deltas in `(t, delta DESC)`
    * order is the number of concurrently-open intervals at each boundary
    * (starts apply before ends at the same instant — touching intervals
    * overlap, the inclusive convention).
    *
    * Emits one row per delta event: `(t, delta, conc)` where `conc` is the
    * concurrency after applying this delta. Rows with identical
    * `(t, delta)` are interchangeable, so every aggregate a consumer wants
    * (max concurrency, first time a level is reached, time-above-threshold)
    * is deterministic.
    *
    * Scale design: the global running sum is a two-level distributed prefix
    * sum, exactly `Chunking.packAssignments`' layout — a within-shard
    * running sum (window partitioned by the order-preserving time shard
    * `t div bucket`), plus an exclusive prefix over the per-shard delta
    * totals. Only the shard-total table (time-range / bucket rows, bounded)
    * crosses a single-partition window and a broadcast; delta rows never
    * leave their hash partitions. The naive `Window.orderBy(t)` with no
    * partition — one task dragging 2×|intervals| rows — is the exact
    * single-node bottleneck this avoids at 100 TB.
    */
  def concurrency(intervals: DataFrame, sCol: String, eCol: String,
                  bucket: Long = 86400L): DataFrame = {
    require(bucket > 0, "bucket must be positive")
    val deltas = intervals
      .select(col(sCol).cast("long").as("t"), lit(1L).as("delta"))
      .unionAll(intervals.select((col(eCol).cast("long") + 1L).as("t"),
        lit(-1L).as("delta")))
      .withColumn("shard", expr(s"t div ${bucket}L"))
    val inShard = Window.partitionBy("shard")
      .orderBy(col("t"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = deltas.withColumn("local_run", sum("delta").over(inShard))
    val overShards = Window.orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = deltas.groupBy("shard").agg(sum("delta").as("tot"))
      .withColumn("off", coalesce(sum("tot").over(overShards), lit(0L)))
      .select("shard", "off")
    local.join(broadcast(offs), "shard")
      .select(col("t"), col("delta"),
        (col("local_run") + col("off")).as("conc"))
  }
}
