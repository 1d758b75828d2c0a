package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed interval (range) join: probes against `[start, end]` date
  * intervals as a HASH equi-join, never a nested loop.
  *
  * A raw `probe BETWEEN start AND end` predicate gives Spark no equi-key,
  * so the planner falls back to BroadcastNestedLoopJoin — O(|intervals| ×
  * |probes|) compares, the classic range-join scale killer. Instead each
  * interval explodes to the `bucketDays`-wide time buckets it covers and
  * each probe computes its single bucket; the join is then a plain
  * hash-partitioned equi-join on the bucket plus an exact residual filter.
  * Expansion cost is interval-span/bucketDays rows per interval (pick
  * bucketDays near the median span); a probe's bucket matches an
  * interval's covered buckets at most once, so no post-join distinct is
  * needed. Both sides shuffle on the bucket key — co-located, skew bounded
  * by per-bucket interval density, AQE-splittable.
  */
object IntervalJoin {

  def bucketedIntervalJoin(intervals: DataFrame, startCol: String,
                           endCol: String, probes: DataFrame,
                           probeCol: String, bucketDays: Int = 7)
      : DataFrame = {
    require(bucketDays > 0)
    val epoch = to_date(lit("1970-01-01"))
    val iv = intervals
      .withColumn("__bkt", explode(sequence(
        (datediff(col(startCol), epoch) / bucketDays).cast("long"),
        (datediff(col(endCol), epoch) / bucketDays).cast("long"))))
    val pr = probes
      .withColumn("__bkt",
        (datediff(col(probeCol), epoch) / bucketDays).cast("long"))
    iv.join(pr, Seq("__bkt"))
      .filter(col(probeCol) >= col(startCol) && col(probeCol) <= col(endCol))
      .drop("__bkt")
  }
}
