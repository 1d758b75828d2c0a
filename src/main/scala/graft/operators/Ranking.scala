package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking: corpus-grain `row_number` without the
  * single-partition global window — the rank primitive behind PIT/quantile
  * transforms, gains tables, and top-p curation cuts.
  */
object Ranking {

  /** Append a global 1-based `row_number` ordered by `(key, tie)` ascending,
    * as a two-level prefix sum (the `Chunking.packAssignments` /
    * `SweepLine.concurrency` layout): rows get a within-shard rank from a
    * window partitioned by the order-preserving shard `key div bucket`, and
    * shard offsets come from an exclusive prefix over the bounded per-shard
    * count table, broadcast back. Rows never cross a global window; the only
    * single-partition work is over `range(key)/bucket` rows.
    *
    * `key` must be a non-negative integral column (`div`-sharding is
    * order-preserving only there — truncation breaks monotonicity below
    * zero); ties within a key land in the same shard by construction, so the
    * `tie` ordering is total. For descending ranks pass a reflected key
    * (`C - key`), not a negated one.
    */
  def globalRowNumber(df: DataFrame, key: Column, tie: Column,
                      bucket: Long = 64L, rankCol: String = "rn")
      : DataFrame = {
    require(bucket > 0, "bucket must be positive")
    // the monotonicity contract holds only for non-negative integral keys:
    // a fractional key silently truncates under cast-to-long and a negative
    // one breaks div-sharding order — reject the first at plan build, the
    // second in-plan on the first offending row (r12 ADVICE)
    val keyType = df.select(key).schema.head.dataType
    require(Seq[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType,
      org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.LongType).contains(keyType),
      s"globalRowNumber: key must be an integral column, got $keyType")
    val keyL = key.cast("long")
    // NULL keys take the otherwise-branch too; coalesce the rendered key so
    // raise_error carries the crafted message instead of throwing on a NULL
    // concat argument with no context (r13 ADVICE)
    val guarded = when(keyL >= 0, keyL).otherwise(raise_error(concat(
      lit("globalRowNumber: key must be non-negative and non-null, got "),
      coalesce(keyL.cast("string"), lit("NULL")))))
    val withShard = df.withColumn("__key", guarded)
      .withColumn("__shard", expr(s"__key div ${bucket}L"))
    val inShard = Window.partitionBy("__shard").orderBy(col("__key"), tie)
    val local = withShard.withColumn("__local_rn",
      row_number().over(inShard).cast("long"))
    val overShards = Window.orderBy("__shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = withShard.groupBy("__shard").agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum("__cnt").over(overShards), lit(0L)))
      .select("__shard", "__off")
    local.join(broadcast(offs), "__shard")
      .withColumn(rankCol, col("__off") + col("__local_rn"))
      .drop("__key", "__shard", "__local_rn", "__off")
  }
}
