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

  /** Deterministic row salt from the row's own columns (no rand(): plans
    * stay replayable and retries produce identical results). */
  def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salts.toLong))

  /** Two-phase count+sum over possibly-skewed keys; decomposable aggregates
    * only (count/sum/min/max re-aggregate losslessly). */
  def saltedCountSum(df: DataFrame, keys: Seq[String], value: Column,
                     salts: Int = 16): DataFrame =
    df.withColumn("__salt", rowSalt(df, salts))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"), sum(value).as("__s"))
      .groupBy(keys.map(col): _*)
      .agg(sum("__n").as("n"), sum("__s").as("s"))
}
