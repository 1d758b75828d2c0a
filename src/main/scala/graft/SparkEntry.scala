package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{AnalyticsQueries, BehaviorQueries, ExtractQueries, LlmQueries, MetricQueries, PipelineQueries, ProbeQueries, Q, RelationalQueries, SignalQueries, TrendQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private lazy val registry: Seq[Q] =
    RelationalQueries.all ++ LlmQueries.all ++ ExtractQueries.all ++
      PipelineQueries.all ++ AnalyticsQueries.all ++ BehaviorQueries.all ++
      SignalQueries.all ++ TrendQueries.all ++ MetricQueries.all ++
      ProbeQueries.all

  /** Flagship: star join + window keep-latest + universe-style filter +
    * quarter-end projection over sf0.001; exercises scan→filter→join→agg→
    * window→sort in one plan. Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    import graft.queries.Tables.t
    import graft.functions.{DateFns => D}
    val li = t(spark, dir, "lineitem"); val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer"); val n = t(spark, dir, "nation")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_orderdate").desc, col("o_orderkey"))
    // customer is fact-scale (grows with SF) — no broadcast hint, AQE picks;
    // nation is a genuinely bounded dim, broadcast is safe at any scale.
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .filter(!col("c_name").rlike("000$"))
      .groupBy("n_name", "o_custkey", "o_orderkey", "o_orderdate")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("n_name"), col("o_custkey"),
        to_date(col("o_orderdate")).as("last_order"),
        D.nextQuarterEnd(to_date(col("o_orderdate"))).as("next_q_end"),
        col("revenue"))
      .orderBy("n_name", "o_custkey")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case Q(name, _, Some(sql)) => name -> sql.trim }.toMap
}
