package graft.pipelines

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.extract.EstimateExtract
import graft.functions.{DateFns, ScalarFns}
import graft.model.Schemas
import graft.operators.LoadOps

/** The estimates pipeline (`estimate-transform-load.rkt:162-440`): one
  * detailed-estimates document per (symbol, folder date) fans out into six
  * target tables — rank_score, sales_estimate, eps_estimate, eps_revision,
  * eps_perception (4 periods each), eps_history (4 trailing quarters).
  *
  * Spark shape: parse ONCE per document (UDF returning the full cell
  * struct), explode the period axis, and project each table from the same
  * parsed column — six outputs off one scan, no re-parse. The reference's
  * per-document transaction becomes doc-level validity filtering (a document
  * whose rank/score text fails the enum vocabulary contributes to no table,
  * like its rollback), and `ON CONFLICT DO NOTHING` becomes
  * [[LoadOps.dedupAppend]] against each table's PK.
  */
object EstimatesPipeline {

  private val parseUdf =
    udf((html: String, fd: String) =>
      EstimateExtract.parse(html, LocalDate.parse(fd)))
      .asNondeterministic()

  /** Estimate-period enum mapping (`estimate-transform-load.rkt:220-225`). */
  private val PeriodEnum: Map[String, String] = Map(
    "current-quarter" -> "Current Quarter", "next-quarter" -> "Next Quarter",
    "current-year" -> "Current Year", "next-year" -> "Next Year")

  // try_cast: under ANSI mode (Spark 4 default) a malformed numeric string
  // would abort the job; NULL-on-malformed is this pipeline's documented
  // tolerance (the reference's cast error rolled back one document).
  private def money(c: Column): Column =
    ScalarFns.naToNull(c).try_cast("double").cast(Schemas.Money)

  private def short(c: Column): Column =
    ScalarFns.naToNull(c).try_cast("short")

  /** Parse + doc-validity filter. Input: act_symbol, html, folder_date. */
  def parsed(docs: DataFrame): DataFrame = {
    val p = docs.withColumn("p",
      parseUdf(col("html"), date_format(col("folder_date"), "yyyy-MM-dd")))
    // Reference rollback analogue: the rank_score insert is first in the
    // transaction; a rank/score that fails its enum cast aborts the whole
    // document (`estimate-transform-load.rkt:177-196`).
    p.filter(
      col("p").getField("rank").isin(Schemas.Enums.rank: _*) &&
        Seq("value", "growth", "momentum", "vgm").map(f =>
          col("p").getField(f).isin(Schemas.Enums.score: _*))
          .reduce(_ && _))
      .select(col("act_symbol"), col("folder_date"), col("p"))
  }

  private def cellFor(section: String, entry: String): Column =
    element_at(element_at(col("p").getField("cells"),
      concat(lit(section + "|"), col("zper"))), entry)

  /** One row per (doc, estimate period), with the enum period label. */
  private def byPeriod(parsedDocs: DataFrame): DataFrame =
    parsedDocs.withColumn("zper",
      explode(array(EstimateExtract.Periods.map(lit): _*)))
      .withColumn("period",
        PeriodEnum.foldLeft(lit(null).cast("string")) {
          case (acc, (k, v)) => when(col("zper") === k, lit(v)).otherwise(acc)
        })

  /** All six target tables from one scan of parsed documents. `pin`
    * materializes the parsed base (lazy localCheckpoint — freed by the
    * ContextCleaner when the plans die, never pinned in the cache manager)
    * so a caller consuming several of the six tables parses each document
    * once, not once per table; a single-table consumer should pass
    * `pin = false` — materializing the deeply nested cell struct costs more
    * than the one parse it saves. */
  def tables(docs: DataFrame, pin: Boolean = true): Map[String, DataFrame] = {
    val base =
      if (pin) parsed(docs).localCheckpoint(eager = false) else parsed(docs)
    val per = byPeriod(base)

    val rankScore = base.select(
      col("act_symbol"), col("folder_date").as("date"),
      col("p").getField("rank").as("rank"),
      col("p").getField("value").as("value"),
      col("p").getField("growth").as("growth"),
      col("p").getField("momentum").as("momentum"),
      col("p").getField("vgm").as("vgm"))

    // Sales estimates use the EPS section's period header — coverage is
    // sometimes worse on the sales side (`estimate-transform-load.rkt:252-253`).
    val salesEstimate = per.select(
      col("act_symbol"), col("folder_date").as("date"), col("period"),
      DateFns.endOfMonthFromHeader(cellFor("eps-estimates", "date"))
        .as("period_end_date"),
      money(cellFor("sales-estimates", "consensus")).as("consensus"),
      short(cellFor("sales-estimates", "count")).as("count"),
      money(cellFor("sales-estimates", "high")).as("high"),
      money(cellFor("sales-estimates", "low")).as("low"),
      money(cellFor("sales-estimates", "year-ago")).as("year_ago"))

    val epsEstimate = per.select(
      col("act_symbol"), col("folder_date").as("date"), col("period"),
      DateFns.endOfMonthFromHeader(cellFor("eps-estimates", "date"))
        .as("period_end_date"),
      money(cellFor("eps-estimates", "consensus")).as("consensus"),
      short(cellFor("eps-estimates", "count")).as("count"),
      money(cellFor("eps-estimates", "recent")).as("recent"),
      money(cellFor("eps-estimates", "high")).as("high"),
      money(cellFor("eps-estimates", "low")).as("low"),
      money(cellFor("eps-estimates", "year-ago")).as("year_ago"))

    val epsRevision = per.select(
      col("act_symbol"), col("folder_date").as("date"), col("period"),
      DateFns.endOfMonthFromHeader(cellFor("eps-revisions", "date"))
        .as("period_end_date"),
      short(cellFor("eps-revisions", "up-7")).as("up_7"),
      short(cellFor("eps-revisions", "up-30")).as("up_30"),
      short(cellFor("eps-revisions", "up-60")).as("up_60"),
      short(cellFor("eps-revisions", "down-7")).as("down_7"),
      short(cellFor("eps-revisions", "down-30")).as("down_30"),
      short(cellFor("eps-revisions", "down-60")).as("down_60"))

    val epsPerception = per.select(
      col("act_symbol"), col("folder_date").as("date"), col("period"),
      DateFns.endOfMonthFromHeader(cellFor("eps-upside", "date"))
        .as("period_end_date"),
      money(cellFor("eps-upside", "most-accurate")).as("most_accurate"))

    val epsHistory = base.withColumn("zper",
      explode(array(EstimateExtract.HistoryQuarters.map(lit): _*)))
      .select(col("act_symbol"),
        DateFns.endOfMonthFromHeader(cellFor("eps-surprise", "date"))
          .as("period_end_date"),
        money(cellFor("eps-surprise", "reported")).as("reported"),
        money(cellFor("eps-surprise", "estimate")).as("estimate"))
      .filter(col("period_end_date").isNotNull)

    Map(
      "rank_score" -> rankScore,
      "sales_estimate" -> salesEstimate,
      "eps_estimate" -> epsEstimate,
      "eps_revision" -> epsRevision,
      "eps_perception" -> epsPerception,
      "eps_history" -> epsHistory)
  }

  /** K1 load: PK-dedup append every fresh table into its stored counterpart. */
  def load(existing: Map[String, DataFrame],
           fresh: Map[String, DataFrame]): Map[String, DataFrame] =
    fresh.map { case (name, df) =>
      name -> LoadOps.dedupAppend(existing(name), df,
        Schemas.primaryKeys(name))
    }
}
