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

  /** Bucketed interval-OVERLAP join — BOTH sides carry `[start, end]`
    * ranges (downtime × incident correlation, campaign × session
    * attribution): pairs where `lStart <= rEnd && rStart <= lEnd`.
    *
    * Same hash-equi-join-on-buckets trick as [[bucketedIntervalJoin]],
    * with one extra subtlety: an overlapping pair shares EVERY bucket its
    * intersection covers, so a naive bucket join emits it once per shared
    * bucket and needs a corpus-sized distinct. Instead the pair is kept
    * only at its FIRST shared bucket — the bucket of the LATER start
    * (`greatest(bkt(lStart), bkt(rStart))`), which both sides cover by
    * definition of overlap — making the output exactly-once with a
    * residual filter, no dedup shuffle. Expansion is span/bucketDays rows
    * per interval; both sides co-partition on the bucket key.
    *
    * Malformed intervals (end < start) are DROPPED before the explode:
    * Spark's `sequence(a, b)` with a > b generates a DESCENDING sequence
    * instead of an empty one, so an inverted interval would otherwise
    * still emit bucket rows and could pass the overlap residual (r12
    * ADVICE) — and an interval that cannot overlap anything by its own
    * definition has no correct output row anyway.
    */
  def bucketedOverlapJoin(left: DataFrame, lStart: String, lEnd: String,
                          right: DataFrame, rStart: String, rEnd: String,
                          bucketDays: Int = 7): DataFrame = {
    require(bucketDays > 0)
    val epoch = to_date(lit("1970-01-01"))
    def bkt(c: org.apache.spark.sql.Column) =
      (datediff(c, epoch) / bucketDays).cast("long")
    val l = left.filter(col(lStart) <= col(lEnd)).withColumn("__bkt",
      explode(sequence(bkt(col(lStart)), bkt(col(lEnd)))))
    val r = right.filter(col(rStart) <= col(rEnd)).withColumn("__bkt",
      explode(sequence(bkt(col(rStart)), bkt(col(rEnd)))))
    l.join(r, Seq("__bkt"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bkt") === greatest(bkt(col(lStart)), bkt(col(rStart))))
      .drop("__bkt")
  }
}
