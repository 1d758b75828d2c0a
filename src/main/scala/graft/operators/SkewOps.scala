package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy aggregation keys.
  *
  * A groupBy on a low-cardinality or Zipfian key funnels each hot key's
  * rows through one reducer; at 100 TB that single task is the job. Salting
  * splits every key into `salts` deterministic sub-keys, aggregates
  * partially per (key, salt) — map-side combine already shrinks this — and
  * reduces the per-key partials in a second, tiny aggregation. AQE's skew
  * handling covers joins; aggregation skew still needs this rewrite.
  */
object SkewOps {

  /** Positional row salt: content hashing would assign IDENTICAL duplicate
    * rows — the worst hot-key shape — one salt, defeating the split.
    * `monotonically_increasing_id` is position-derived, so duplicates
    * spread evenly; it varies with the input partitioning, which is safe
    * here because the salt only shapes the partial-aggregation layout — the
    * final re-aggregated answer is salt-invariant. */
  def rowSalt(salts: Int): Column =
    pmod(monotonically_increasing_id(), lit(salts.toLong))

  /** Two-phase count+sum over possibly-skewed keys; decomposable aggregates
    * only (count/sum/min/max re-aggregate losslessly). */
  def saltedCountSum(df: DataFrame, keys: Seq[String], value: Column,
                     salts: Int = 16): DataFrame =
    df.withColumn("__salt", rowSalt(salts))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"), sum(value).as("__s"))
      .groupBy(keys.map(col): _*)
      .agg(sum("__n").as("n"), sum("__s").as("s"))
}
