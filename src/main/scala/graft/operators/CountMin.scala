package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a token stream — approximate per-word frequencies
  * in O(d·w) state instead of a vocabulary-sized table.
  *
  * The 100-TB story is the state bound: the sketch is a fixed d×w grid of
  * counters, so map-side partial aggregation compresses every partition's
  * contribution to ≤ d·w cells before the shuffle, and the merged sketch
  * is the elementwise sum (mergeable, same argument as the fixed-bin
  * histograms in [[Quantiles]]). An exact word-frequency table shuffles
  * vocabulary-sized state that grows with the corpus; the sketch's does
  * not, at the price of a bounded overcount (never undercount):
  * est(x) = min_j cell(j, h_j(x)) ≥ true(x), with the classic
  * (ε = e/w, δ = e^-d) bound on the excess.
  *
  * Hash rows reuse the repo's determinism workhorse: row j's bucket is the
  * j-th disjoint 8-hex-digit slice of md5(word) mod w — four independent
  * 32-bit hashes per md5, exactly reproducible in any engine with md5
  * (the DuckDB oracle mirrors it digit by digit, sa1's trick).
  *
  * Reference scope: beyond-reference LLM-pipeline layer (corpus statistics
  * at scale), sibling to [[KmvDistinct]].
  */
object CountMin {

  /** Row-j bucket of a word: md5 hex digits [j·8+1, j·8+8] as a 32-bit
    * integer, mod `width`. Requires j < 4 (md5 has 32 hex digits). */
  def bucket(w: Column, j: Int, width: Int): Column =
    conv(substring(md5(w), j * 8 + 1, 8), 16, 10).cast("long") % width

  private def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("true_cnt"))

  private def bucketsOf(w: Column, d: Int, width: Int): Column =
    array((0 until d).map(j => bucket(w, j, width)): _*)

  /** The materialized sketch: one row per non-empty cell
    * (j, bucket, cell_count). Two-level aggregation — the word rollup
    * first (bounded by vocabulary per partition), then the d×w cell
    * rollup (bounded by the sketch size, the shuffle that matters). */
  def sketchCells(docs: DataFrame, textCol: String, d: Int = 4,
                  width: Int = 512): DataFrame = {
    require(d >= 1 && d <= 4, "md5 yields 4 disjoint 8-hex-digit rows")
    require(width > 0)
    wordCounts(docs, textCol)
      .select(col("true_cnt").as("cnt"),
        posexplode(bucketsOf(col("word"), d, width)).as(Seq("j", "bucket")))
      .groupBy("j", "bucket").agg(sum("cnt").as("cell_count"))
  }

  /** Sketch-accuracy audit (the production read path queries the sketch
    * alone; the audit carries the exact count per probe to measure the
    * overcount, the same shape as sim5's recall audits): for the top-`k`
    * words by true frequency, the CMS estimate, the truth, and the
    * excess — provably ≥ 0. Probes resolve via TakeOrderedAndProject
    * (no global sort), and the 2048-cell sketch broadcasts into the
    * lookup join. */
  def heavyHitterAudit(docs: DataFrame, textCol: String, d: Int = 4,
                       width: Int = 512, k: Int = 20): DataFrame = {
    val words = wordCounts(docs, textCol)
    val cells = sketchCells(docs, textCol, d, width)
    val probes = words.orderBy(desc("true_cnt"), asc("word")).limit(k)
    probes
      .select(col("word"), col("true_cnt"),
        posexplode(bucketsOf(col("word"), d, width)).as(Seq("j", "bucket")))
      .join(broadcast(cells), Seq("j", "bucket"))
      .groupBy("word", "true_cnt")
      .agg(min("cell_count").as("est_cnt"))
      .withColumn("overcount", col("est_cnt") - col("true_cnt"))
  }
}
