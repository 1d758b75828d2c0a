package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-engineering transforms for model-training pipelines. */
object FeatureOps {

  /** Smoothed LEAVE-ONE-OUT target encoding of a categorical column — the
    * standard high-cardinality categorical → numeric transform for
    * tree/linear models:
    *
    *   enc_i = (sum_cat(y) − y_i + m·prior) / (n_cat − 1 + m)
    *
    * with `prior` the global target mean and `m` the smoothing
    * pseudo-count. Leaving the row's OWN target out of its encoding is
    * what prevents the target leak that makes naive mean-encoding
    * overfit; smoothing shrinks rare categories toward the prior.
    *
    * Cross-engine float discipline: `target` must be an INTEGER 0/1 (or
    * small-int) column — the per-category and global sums then stay
    * integer-exact (no float-accumulation order dependence), and every
    * emitted double is one correctly-rounded expression over exact
    * integers, reproducible on any engine.
    *
    * Scale shape: one category-keyed aggregate (mergeable partial sums)
    * broadcast back onto the scan + one 1-row global aggregate — the
    * fact table never shuffles. Singleton categories (n_cat = 1) fall
    * back to the smoothed prior with the row excluded: m·prior / m =
    * prior exactly.
    *
    * NULL categories are a category of their own: the probe joins
    * null-safely (`<=>`), so rows with a NULL `cat` encode against the
    * NULL group's leave-one-out statistics instead of silently dropping
    * out of the output (r12 ADVICE).
    */
  def looTargetEncode(df: DataFrame, cat: Column, target: Column,
                      smoothing: Double = 20.0): DataFrame = {
    require(smoothing > 0, s"smoothing must be positive, got $smoothing")
    val y = target.cast("long")
    val byCat = df.groupBy(cat.as("__cat"))
      .agg(sum(y).as("__cat_sum"), count(lit(1)).as("__cat_n"))
    val glob = df.agg(sum(y).as("__tot_sum"), count(lit(1)).as("__tot_n"))
    df.withColumn("__y", y)
      .join(broadcast(byCat), cat <=> col("__cat"))
      .crossJoin(broadcast(glob))
      .withColumn("__prior", col("__tot_sum") / col("__tot_n"))
      .withColumn("target_enc",
        (col("__cat_sum") - col("__y") + lit(smoothing) * col("__prior"))
          / (col("__cat_n") - 1 + lit(smoothing)))
      .drop("__cat", "__cat_sum", "__cat_n", "__tot_sum", "__tot_n",
        "__prior", "__y")
  }
}
