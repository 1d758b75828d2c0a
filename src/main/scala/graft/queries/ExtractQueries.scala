package graft.queries

import java.time.LocalDate

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.extract.{CalendarExtract, EstimateExtract, StatementExtract}
import Tables.t

/** U1–U8 graded round trips. Each query builds a fixture document per source
  * row (deterministic cell text derived from the row's keys, wrapped in
  * realistic noisy HTML/JSON — unquoted attributes, comments, unclosed tags,
  * wrapper spans), runs the REAL extractor over it, and the DuckDB oracle
  * recomputes the expected values straight from the same source columns.
  * That checks the tolerant parser + layout addressing + sanitize chain end
  * to end, not just that two engines run the same SQL.
  */
object ExtractQueries {

  /** Document-parse inputs come from ONE small parquet file, i.e. one input
    * split — without an explicit repartition every CPU-heavy parse would run
    * on a single core. Spreading to the default parallelism is the same
    * move a real ingest makes when a date folder arrives as few large
    * files. */
  private[queries] def spread(s: org.apache.spark.sql.SparkSession,
                              df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    df.repartition(s.sparkContext.defaultParallelism)

  // ---------------------------------------------------------------- fixtures

  /** Estimate-cell vocabulary covering every F1 sanitizer shape
    * (`estimate-transform-load.rkt:118-125`). */
  private def estVariant(idx: Long): String =
    (math.floorMod(idx, 8)).toInt match {
      case 0 => "1,234.5"
      case 1 => " (12.3) "
      case 2 => "NA"
      case 3 => "M"
      case 4 => "2.5B"
      case 5 => "1.2T"
      case 6 => "10.00M"
      case _ => "42.75"
    }

  /** DuckDB rendering of estVariant ∘ F1-sanitize. */
  private def estCase(idx: String): String =
    s"""CASE CAST(($idx) % 8 AS INTEGER)
        WHEN 0 THEN '1234.5' WHEN 1 THEN '12.3' WHEN 2 THEN 'NA'
        WHEN 3 THEN 'NA' WHEN 4 THEN '2.5e9' WHEN 5 THEN '1.2e12'
        WHEN 6 THEN '10.00e6' ELSE '42.75' END"""

  /** Statement-cell vocabulary for the F2 chain (trim + strip commas only —
    * parens survive, unlike F1). */
  private def stVariant(idx: Long): String =
    (math.floorMod(idx, 4)).toInt match {
      case 0 => "1,234.5"
      case 1 => " 567.8 "
      case 2 => "NA"
      case _ => "(9.1)"
    }

  private def stCase(idx: String): String =
    s"""CASE CAST(($idx) % 4 AS INTEGER)
        WHEN 0 THEN '1234.5' WHEN 1 THEN '567.8' WHEN 2 THEN 'NA'
        ELSE '(9.1)' END"""

  private def estIdx(pk: Long, s: Int, r: Int, c: Int): Long =
    pk * 7 + s * 31 + r * 5 + c

  private def estDateHeader(pk: Long, s: Int, c: Int): String = {
    val m = ((pk + c) % 12) + 1
    val y = 2020 + ((pk + s + c) % 6)
    s"($m/$y)"
  }

  /** SMALLINT-castable vocabulary for counter rows (count, up/down revision
    * tallies — real smallints in the reference, `schema.sql:173-190`): plain
    * integers both engines cast identically, 'NA' (→ NULL) roughly one cell
    * in 11. Decimal strings are deliberately absent — Spark truncates
    * '1.5'→SHORT while DuckDB rounds, so they could never hash-match. */
  private def intVariant(idx: Long): String =
    if (math.floorMod(idx, 11) == 0) "NA" else math.floorMod(idx, 89).toString

  /** One estimates table: label column + periods 2..5, with wrapper-span and
    * unquoted-attribute noise. Rows listed in `intRows` render the
    * [[intVariant]] counter vocabulary instead of the money cells. */
  private def estTable(pk: Long, s: Int, nRows: Int,
                       intRows: Set[Int] = Set.empty): String = {
    val thead = (2 to 5).map(c => s"<th>${estDateHeader(pk, s, c)}</th>")
      .mkString
    val body = (1 to nRows).map { r =>
      val cellFn: Long => String = if (intRows(r)) intVariant else estVariant
      val tds = (2 to 5).map(c =>
        s"""<td><span class="lbl">#</span> ${cellFn(estIdx(pk, s, r, c))}</td>""")
        .mkString
      s"<tr><td class=alpha>Row $r$tds" // unclosed label td + tr: tolerance
    }.mkString("\n")
    s"""<table><thead><tr><th>Period</th>$thead</thead><tbody>
       |$body
       |</tbody></table>""".stripMargin
  }

  /** `intCounts` switches the counter rows — row 2 (count) of both
    * detailed-estimates tables and every agreement row (up/down tallies) —
    * to the castable [[intVariant]] vocabulary, so the pipe1* loads grade
    * real SMALLINT values instead of all-NULL columns. The plain U1 fixture
    * keeps the all-money vocabulary (its oracle grades raw cell strings). */
  private def estSections(pk: Long, intCounts: Boolean = false): String = {
    val countRows = if (intCounts) Set(2) else Set.empty[Int]
    val revRows = if (intCounts) (1 to 6).toSet else Set.empty[Int]
    s"""<section id="detailed_earnings_estimates">
       |${estTable(pk, 0, 5, countRows)}
       |${estTable(pk, 1, 6, countRows)}
       |</section>
       |<section id="agreement_estimate">${estTable(pk, 2, 6, revRows)}</section>
       |<section id="quote_upside">${estTable(pk, 3, 1)}</section>
       |<section id="surprised_reported">${estTable(pk, 4, 2)}</section>""".stripMargin
  }

  private def buildEstimatesHtml(pk: Long): String =
    s"""<!DOCTYPE html><html><body id="home"><!-- fixture $pk -->
       |<div id="main_content"><div id="right_content">
       |${estSections(pk)}
       |</div></div></body></html>""".stripMargin

  /** Full detailed-estimates document: hero-era ribbon (rank + styles) AND
    * the five table sections — what [[graft.pipelines.EstimatesPipeline]]
    * consumes. Counter rows carry castable integers (`intCounts`). */
  private[queries] def buildFullEstimateDoc(pk: Long): String =
    s"""<!DOCTYPE html><html><body id="home">
       |<div id="main_content"><div id="right_content">
       |<section class="quote_page_hero_section">${ribbonSection(pk, pipes = true)}</section>
       |${estSections(pk, intCounts = true)}
       |</div></div></body></html>""".stripMargin

  private val RankNames =
    Seq("Strong Buy", "Buy", "Hold", "Sell", "Strong Sell")

  /** The quote-ribbon section alone (hero-shaped span layout when `pipes`). */
  private def ribbonSection(pk: Long, pipes: Boolean,
                            styleDiv3: Boolean = false): String = {
    val d = (pk % 5) + 1
    val rankP =
      s"""<p>\n  <span class="rank_chip"></span>\n  $d-${RankNames((d - 1).toInt)}\n</p>"""
    def letter(n: Int): Char = ('A' + ((pk + n) % 5).toInt).toChar
    val plainSpans = (1 to 4).map(n => s"<span>${letter(n)}</span>").mkString
    val pipeSpans = (1 to 4).map(n => s"<span> ${letter(n)} </span>")
      .mkString("<span> | </span>")
    val styleP = if (pipes) s"<p>$pipeSpans</p>" else s"<p>$plainSpans</p>"
    val innerDivs =
      if (styleDiv3)
        s"<div>$rankP</div><div><p>filler</p></div><div>$styleP</div>"
      else s"<div>$rankP</div><div>$styleP</div>"
    s"""<section id="quote_ribbon_v2"><div><p>price</p></div><div>$innerDivs</div></section>"""
  }

  /** Quote-ribbon fixture for one of the five layout eras
    * (`estimate-transform-load.rkt:14-76`). */
  private def buildRibbonHtml(pk: Long, era: Int): String = {
    val ribbon = ribbonSection(pk, pipes = era >= 2,
      styleDiv3 = era == 1 || era == 2)
    val content =
      if (era == 4)
        s"""<section class="quote_page_hero_section banner">$ribbon</section>"""
      else ribbon
    s"""<html><body id="home"><div id="main_content"><div id="right_content">
       |$content
       |</div></div></body></html>""".stripMargin
  }

  /** Folder dates landing inside each era's cutoff window. */
  private val EraDates = Seq("2018-01-01", "2019-01-01", "2020-08-01",
    "2022-01-01", "2025-01-01")

  private def stIdx(pk: Long, per: Int, tbl: Int, r: Int, c: Int): Long =
    pk * 11 + per * 13 + tbl * 17 + r * 7 + c

  private def stDateHeader(pk: Long, per: Int, c: Int,
                           yy2: Boolean = false): String = {
    val m = ((pk + c) % 12) + 1
    val dd = 10 + ((pk + per) % 15)
    val y = 2015 + ((pk + c) % 8)
    if (yy2) s"$m/$dd/${y - 2000}" else s"$m/$dd/$y"
  }

  private def stmtTable(pk: Long, per: Int, tbl: Int, nRows: Int,
                        yy2: Boolean = false,
                        cellFn: Long => String = stVariant): String = {
    val thead = (2 to 6).map(c => s"<th>${stDateHeader(pk, per, c, yy2)}</th>")
      .mkString
    val body = (1 to nRows).map { r =>
      val tds = (2 to 6).map(c =>
        s"<td>${cellFn(stIdx(pk, per, tbl, r, c))}</td>").mkString
      s"<tr><td class=alpha>Item $r</td>$tds</tr>"
    }.mkString("\n")
    s"""<table><thead><tr><th>Items</th>$thead</tr></thead><tbody>
       |$body
       |</tbody></table>""".stripMargin
  }

  /** Mostly-numeric statement cells for the STRICT-mode fixture: one cell in
    * 23 is 'NA' (fails `::decimal`, the reference's per-insert abort,
    * `income-statement-transform-load.rkt:201-226`), so ~40% of exploded
    * rows survive strict mode — both modes stay non-empty and visibly
    * differ. The stock [[stVariant]] vocabulary is half-uncastable, which
    * under strict semantics would drop essentially every row. */
  private def strictVariant(idx: Long): String =
    if (math.floorMod(idx, 23) == 0) "NA"
    else s"${math.floorMod(idx, 997)}.5"

  /** Income-statement fixture with [[strictVariant]] cells + 2-digit-year
    * headers, for the strict-vs-tolerant pipeline grade. */
  private[queries] def buildIncomeDocStrict(pk: Long): String = {
    val annual =
      s"""<div id="annual_income_statement">
         |${stmtTable(pk, 0, 1, 15, yy2 = true, strictVariant)}
         |${stmtTable(pk, 0, 2, 2, yy2 = true, strictVariant)}
         |${stmtTable(pk, 0, 3, 3, yy2 = true, strictVariant)}
         |</div>""".stripMargin
    val quarterly =
      s"""<div id="quarterly_income_statement">
         |${stmtTable(pk, 1, 1, 15, yy2 = true, strictVariant)}
         |${stmtTable(pk, 1, 2, 3, yy2 = true, strictVariant)}
         |</div>""".stripMargin
    s"<html><body id=home>\n$annual\n$quarterly\n</body></html>"
  }

  private[queries] def buildBalanceHtml(pk: Long): String = {
    val divs = Seq("annual" -> 0, "quarterly" -> 1).map { case (pn, per) =>
      s"""<div id="${pn}_income_statement">
         |${stmtTable(pk, per, 1, 14)}
         |${stmtTable(pk, per, 2, 16)}
         |${stmtTable(pk, per, 3, 11)}
         |</div>""".stripMargin
    }.mkString("\n")
    s"<html><body id=home>\n$divs\n</body></html>"
  }

  private def buildIncomeHtml(pk: Long): String = buildIncomeDoc(pk, yy2 = false)

  /** Income-statement fixture; `yy2` renders the reference's 2-digit-year
    * headers ("M/dd/yy", `income-statement-transform-load.rkt:100-102`) for
    * pipeline-level tests that parse the dates. */
  private[queries] def buildIncomeDoc(pk: Long, yy2: Boolean): String = {
    val annual =
      s"""<div id="annual_income_statement">
         |${stmtTable(pk, 0, 1, 15, yy2)}
         |${stmtTable(pk, 0, 2, 2, yy2)}
         |${stmtTable(pk, 0, 3, 3, yy2)}
         |</div>""".stripMargin
    val quarterly =
      s"""<div id="quarterly_income_statement">
         |${stmtTable(pk, 1, 1, 15, yy2)}
         |${stmtTable(pk, 1, 2, 3, yy2)}
         |</div>""".stripMargin
    s"<html><body id=home>\n$annual\n$quarterly\n</body></html>"
  }

  private[queries] def buildCashFlowLegacyHtml(pk: Long): String =
    s"""<html><body id=home>
       |<section id="cash_flow_operation">${stmtTable(pk, 0, 1, 12)}</section>
       |<section id="cash_flow_use">${stmtTable(pk, 0, 2, 11)}</section>
       |</body></html>""".stripMargin

  /** Legacy cash-flow fixture with the mostly-castable [[strictVariant]]
    * cells (NULL only when idx%23 = 0). The pipe4b poison-guard grade needs
    * rows where ALL 22 facts are non-null — with the half-uncastable stock
    * vocabulary no (doc, date) row is ever all-non-null and the J1 drop
    * branch would be unreachable; here ~4/23 of poisoned rows genuinely
    * drop. */
  private[queries] def buildCashFlowLegacyNumHtml(pk: Long): String =
    s"""<html><body id=home>
       |<section id="cash_flow_operation">${stmtTable(pk, 0, 1, 12, cellFn = strictVariant)}</section>
       |<section id="cash_flow_use">${stmtTable(pk, 0, 2, 11, cellFn = strictVariant)}</section>
       |</body></html>""".stripMargin

  private[queries] def buildCashFlow2024Html(pk: Long): String = {
    val divs = Seq("annual" -> 0, "quarterly" -> 1).map { case (pn, per) =>
      s"""<div id="${pn}_cash_flow_statement">
         |<div>${stmtTable(pk, per, 1, 12)}</div>
         |<div>${stmtTable(pk, per, 2, 11)}</div>
         |</div>""".stripMargin
    }.mkString("\n")
    s"<html><body id=home>\n$divs\n</body></html>"
  }

  // ------------------------------------------------------------------- UDFs

  private val buildEstimatesUdf = udf(buildEstimatesHtml _)
  private val buildRibbonUdf = udf((pk: Long, era: Int) =>
    buildRibbonHtml(pk, era))
  private val buildBalanceUdf = udf(buildBalanceHtml _)
  private val buildIncomeUdf = udf(buildIncomeHtml _)
  private val buildCfLegacyUdf = udf(buildCashFlowLegacyHtml _)
  private val buildCf2024Udf = udf(buildCashFlow2024Html _)

  // asNondeterministic: the parsers ARE pure, but the flag stops Catalyst
  // from inlining one UDF call per projected field when projections collapse
  // — one parse per document is the whole point of the struct return.
  private val parseEstimatesUdf =
    udf((html: String, folderDate: String) =>
      EstimateExtract.parse(html, LocalDate.parse(folderDate)))
      .asNondeterministic()
  private val parseBalanceUdf =
    udf(StatementExtract.parseBalanceSheet _).asNondeterministic()
  private val parseIncomeUdf =
    udf(StatementExtract.parseIncomeStatement _).asNondeterministic()
  private val parseCfLegacyUdf =
    udf(StatementExtract.parseCashFlowLegacy _).asNondeterministic()
  private val parseCf2024Udf =
    udf(StatementExtract.parseCashFlow2024 _).asNondeterministic()

  private def cellOf(parsed: Column, section: String, period: String,
                     entry: String): Column =
    element_at(element_at(parsed.getField("cells"),
      EstimateExtract.cellKey(section, period)), entry)

  private def entryOf(row: Column, name: String): Column =
    element_at(row.getField("entries"), name)

  /** Oracle scaffold for statement queries: one row per
    * (part row × period × dateIdx). */
  private def stmtOracle(periods: String, selects: String): String =
    s"""
      SELECT p_partkey, period, di AS date_idx, $selects
      FROM part
      CROSS JOIN (VALUES $periods) AS pp(period, per)
      CROSS JOIN (SELECT unnest(generate_series(1, 5)) AS di)
      ORDER BY p_partkey, period, date_idx"""

  private val stmtDateSql =
    """CAST(((p_partkey + di + 1) % 12) + 1 AS VARCHAR) || '/' ||
       CAST(10 + ((p_partkey + per) % 15) AS VARCHAR) || '/' ||
       CAST(2015 + ((p_partkey + di + 1) % 8) AS VARCHAR)"""

  // ---------------------------------------------------------------- queries

  val all: Seq[Q] = Seq(

    // U1 — estimate table cells across all five sections, all periods, with
    // the F1 sanitize chain, via the one-parse-per-document UDF.
    Q("u1_estimate_cells", (s, dir) => {
      val parsed = spread(s, t(s, dir, "part").select(col("p_partkey")))
        .withColumn("p", parseEstimatesUdf(
          buildEstimatesUdf(col("p_partkey")), lit("2025-01-01")))
      parsed.select(col("p_partkey"),
        cellOf(col("p"), "eps-estimates", "current-quarter", "consensus")
          .as("eps_consensus_cq"),
        cellOf(col("p"), "eps-estimates", "current-quarter", "date")
          .as("eps_date_cq"),
        cellOf(col("p"), "sales-estimates", "current-year", "high")
          .as("sales_high_cy"),
        cellOf(col("p"), "eps-revisions", "next-year", "down-60")
          .as("rev_down60_ny"),
        cellOf(col("p"), "eps-upside", "current-quarter", "most-accurate")
          .as("upside_ma_cq"),
        cellOf(col("p"), "eps-surprise", "two-quarters-ago", "reported")
          .as("surprise_rep_2q"),
        cellOf(col("p"), "eps-surprise", "four-quarters-ago", "estimate")
          .as("surprise_est_4q"))
        .orderBy("p_partkey")
    }, Some(s"""
      SELECT p_partkey,
        ${estCase("p_partkey*7 + 1*31 + 1*5 + 2")} AS eps_consensus_cq,
        CAST(((p_partkey + 2) % 12) + 1 AS VARCHAR) || '/' ||
          CAST(2020 + ((p_partkey + 1 + 2) % 6) AS VARCHAR) AS eps_date_cq,
        ${estCase("p_partkey*7 + 0*31 + 3*5 + 4")} AS sales_high_cy,
        ${estCase("p_partkey*7 + 2*31 + 6*5 + 5")} AS rev_down60_ny,
        ${estCase("p_partkey*7 + 3*31 + 1*5 + 2")} AS upside_ma_cq,
        ${estCase("p_partkey*7 + 4*31 + 1*5 + 3")} AS surprise_rep_2q,
        ${estCase("p_partkey*7 + 4*31 + 2*5 + 5")} AS surprise_est_4q
      FROM part ORDER BY p_partkey""")),

    // U2+U3 — rank + four style scores across ALL five date-gated layout
    // eras (era = pk % 5 picks both the DOM shape and the folder date).
    Q("u2_u3_rank_style_layouts", (s, dir) => {
      val base = spread(s, t(s, dir, "part").select(col("p_partkey")))
        .withColumn("era", (col("p_partkey") % 5).cast("int"))
      val folderDate = element_at(
        array(EraDates.map(lit): _*), col("era") + 1)
      val parsed = base.withColumn("p",
        parseEstimatesUdf(buildRibbonUdf(col("p_partkey"), col("era")),
          folderDate))
      parsed.select(col("p_partkey"), col("era"),
        col("p").getField("rank").as("rank"),
        col("p").getField("value").as("value"),
        col("p").getField("growth").as("growth"),
        col("p").getField("momentum").as("momentum"),
        col("p").getField("vgm").as("vgm"))
        .orderBy("p_partkey")
    }, Some("""
      SELECT p_partkey, CAST(p_partkey % 5 AS INTEGER) AS era,
        CASE CAST(p_partkey % 5 AS INTEGER)
          WHEN 0 THEN 'Strong Buy' WHEN 1 THEN 'Buy' WHEN 2 THEN 'Hold'
          WHEN 3 THEN 'Sell' ELSE 'Strong Sell' END AS rank,
        chr(65 + CAST((p_partkey + 1) % 5 AS INTEGER)) AS value,
        chr(65 + CAST((p_partkey + 2) % 5 AS INTEGER)) AS growth,
        chr(65 + CAST((p_partkey + 3) % 5 AS INTEGER)) AS momentum,
        chr(65 + CAST((p_partkey + 4) % 5 AS INTEGER)) AS vgm
      FROM part ORDER BY p_partkey""")),

    // U4 — balance-sheet figures: 3 tables × (2 periods × 5 date columns),
    // including the row-9-skip in the equity table.
    Q("u4_balance_sheet_cells", (s, dir) => {
      val parsed = spread(s, t(s, dir, "part").select(col("p_partkey")))
        .withColumn("p", parseBalanceUdf(buildBalanceUdf(col("p_partkey"))))
        .select(col("p_partkey"), explode(col("p").getField("rows")).as("r"))
      parsed.select(col("p_partkey"),
        col("r").getField("period").as("period"),
        col("r").getField("dateIdx").as("date_idx"),
        entryOf(col("r"), "date").as("date"),
        entryOf(col("r"), "cash_and_equivalents").as("cash_and_equivalents"),
        entryOf(col("r"), "total_assets").as("total_assets"),
        entryOf(col("r"), "total_liabilities").as("total_liabilities"),
        entryOf(col("r"), "retained_earnings").as("retained_earnings"),
        entryOf(col("r"), "book_value_per_share").as("book_value_per_share"))
        .orderBy("p_partkey", "period", "date_idx")
    }, Some(stmtOracle("('annual', 0), ('quarterly', 1)",
      s"""$stmtDateSql AS date,
        ${stCase("p_partkey*11 + per*13 + 1*17 + 2*7 + di + 1")} AS cash_and_equivalents,
        ${stCase("p_partkey*11 + per*13 + 1*17 + 14*7 + di + 1")} AS total_assets,
        ${stCase("p_partkey*11 + per*13 + 2*17 + 16*7 + di + 1")} AS total_liabilities,
        ${stCase("p_partkey*11 + per*13 + 3*17 + 4*7 + di + 1")} AS retained_earnings,
        ${stCase("p_partkey*11 + per*13 + 3*17 + 11*7 + di + 1")} AS book_value_per_share"""))),

    // U5 — income-statement figures incl. the annual period-offset quirk:
    // per-share entries read table 3 on annual pages, table 2 on quarterly.
    Q("u5_income_statement_cells", (s, dir) => {
      val parsed = spread(s, t(s, dir, "part").select(col("p_partkey")))
        .withColumn("p", parseIncomeUdf(buildIncomeUdf(col("p_partkey"))))
        .select(col("p_partkey"), explode(col("p").getField("rows")).as("r"))
      parsed.select(col("p_partkey"),
        col("r").getField("period").as("period"),
        col("r").getField("dateIdx").as("date_idx"),
        entryOf(col("r"), "date").as("date"),
        entryOf(col("r"), "sales").as("sales"),
        entryOf(col("r"), "net_income").as("net_income"),
        entryOf(col("r"), "depreciation_and_amortization").as("dep_amort"),
        entryOf(col("r"), "average_shares").as("average_shares"),
        entryOf(col("r"), "diluted_net_eps").as("diluted_net_eps"))
        .orderBy("p_partkey", "period", "date_idx")
    }, Some(stmtOracle("('annual', 0), ('quarterly', 1)",
      s"""$stmtDateSql AS date,
        ${stCase("p_partkey*11 + per*13 + 1*17 + 1*7 + di + 1")} AS sales,
        ${stCase("p_partkey*11 + per*13 + 1*17 + 15*7 + di + 1")} AS net_income,
        ${stCase("p_partkey*11 + per*13 + 2*17 + 2*7 + di + 1")} AS dep_amort,
        ${stCase("p_partkey*11 + per*13 + (CASE period WHEN 'annual' THEN 3 ELSE 2 END)*17 + 1*7 + di + 1")} AS average_shares,
        ${stCase("p_partkey*11 + per*13 + (CASE period WHEN 'annual' THEN 3 ELSE 2 END)*17 + 3*7 + di + 1")} AS diluted_net_eps"""))),

    // U6 — legacy cash-flow layout: two section ids, annual only.
    Q("u6_cash_flow_legacy_cells", (s, dir) => {
      val parsed = spread(s, t(s, dir, "part").select(col("p_partkey")))
        .withColumn("p", parseCfLegacyUdf(buildCfLegacyUdf(col("p_partkey"))))
        .select(col("p_partkey"), explode(col("p").getField("rows")).as("r"))
      parsed.select(col("p_partkey"),
        col("r").getField("dateIdx").as("date_idx"),
        entryOf(col("r"), "date").as("date"),
        entryOf(col("r"), "net_income").as("net_income"),
        entryOf(col("r"), "net_cash_from_investing_activities")
          .as("net_cash_investing"),
        entryOf(col("r"), "issuance_of_capital_stock").as("issuance_stock"),
        entryOf(col("r"), "cash_at_end_of_period").as("cash_end"),
        entryOf(col("r"), "diluted_net_eps").as("diluted_net_eps"))
        .orderBy("p_partkey", "date_idx")
    }, Some(s"""
      SELECT p_partkey, di AS date_idx,
        CAST(((p_partkey + di + 1) % 12) + 1 AS VARCHAR) || '/' ||
          CAST(10 + (p_partkey % 15) AS VARCHAR) || '/' ||
          CAST(2015 + ((p_partkey + di + 1) % 8) AS VARCHAR) AS date,
        ${stCase("p_partkey*11 + 1*17 + 2*7 + di + 1")} AS net_income,
        ${stCase("p_partkey*11 + 1*17 + 12*7 + di + 1")} AS net_cash_investing,
        ${stCase("p_partkey*11 + 2*17 + 1*7 + di + 1")} AS issuance_stock,
        ${stCase("p_partkey*11 + 2*17 + 10*7 + di + 1")} AS cash_end,
        ${stCase("p_partkey*11 + 2*17 + 11*7 + di + 1")} AS diluted_net_eps
      FROM part
      CROSS JOIN (SELECT unnest(generate_series(1, 5)) AS di)
      ORDER BY p_partkey, date_idx""")),

    // U7 — 2024-02-01 cash-flow layout: per-period div wrappers with inner
    // div[1|2] table containers (the variant in production).
    Q("u7_cash_flow_2024_cells", (s, dir) => {
      val parsed = spread(s, t(s, dir, "part").select(col("p_partkey")))
        .withColumn("p", parseCf2024Udf(buildCf2024Udf(col("p_partkey"))))
        .select(col("p_partkey"), explode(col("p").getField("rows")).as("r"))
      parsed.select(col("p_partkey"),
        col("r").getField("period").as("period"),
        col("r").getField("dateIdx").as("date_idx"),
        entryOf(col("r"), "date").as("date"),
        entryOf(col("r"), "net_income").as("net_income"),
        entryOf(col("r"), "payment_of_dividends_and_other_distributions")
          .as("dividends_paid"),
        entryOf(col("r"), "cash_at_beginning_of_period").as("cash_begin"),
        entryOf(col("r"), "diluted_net_eps").as("diluted_net_eps"))
        .orderBy("p_partkey", "period", "date_idx")
    }, Some(stmtOracle("('annual', 0), ('quarterly', 1)",
      s"""$stmtDateSql AS date,
        ${stCase("p_partkey*11 + per*13 + 1*17 + 2*7 + di + 1")} AS net_income,
        ${stCase("p_partkey*11 + per*13 + 2*17 + 4*7 + di + 1")} AS dividends_paid,
        ${stCase("p_partkey*11 + per*13 + 2*17 + 9*7 + di + 1")} AS cash_begin,
        ${stCase("p_partkey*11 + per*13 + 2*17 + 11*7 + di + 1")} AS diluted_net_eps"""))),

    // U8 — earnings-calendar JSON path: F7 noise strip → from_json →
    // explode → positional element_at → when-enum mapping. Pure expressions.
    Q("u8_earnings_calendar_json", (s, dir) => {
      val ck = col("c_custkey")
      val when1 = when(ck % 3 === 0, lit("amc"))
        .when(ck % 3 === 1, lit("bmo")).otherwise(lit("--"))
      val when2 = when((ck + 1) % 3 === 0, lit("amc"))
        .when((ck + 1) % 3 === 1, lit("bmo")).otherwise(lit("--"))
      val raw = concat(
        lit("window.app_data = {\"data\": [[\"<b>S"), ck,
        lit("</b>\", \"x\", \"y\", \""), when1,
        lit("\", \"z\"], [\"NFLX Quick QuoteS"), ck,
        lit("B\", \"x\", \"y\", \""), when2, lit("\", \"z\"]]}"))
      val df = t(s, dir, "customer")
        .select(ck, raw.as("raw"),
          date_add(lit("2024-01-01").cast("date"), (ck % 28).cast("int"))
            .as("event_date"))
      CalendarExtract.earningsRows(df, col("raw"), col("event_date"))
        .orderBy("act_symbol")
    }, Some("""
      WITH e AS (
        SELECT 'S' || CAST(c_custkey AS VARCHAR) AS act_symbol,
               CAST(c_custkey % 3 AS INTEGER) AS w, c_custkey AS ck
        FROM customer
        UNION ALL
        SELECT 'S' || CAST(c_custkey AS VARCHAR) || 'B',
               CAST((c_custkey + 1) % 3 AS INTEGER), c_custkey
        FROM customer)
      SELECT act_symbol,
             CAST(DATE '2024-01-01' + INTERVAL (ck % 28) DAY AS DATE) AS date,
             CASE w WHEN 0 THEN 'After market close'
                    WHEN 1 THEN 'Before market open' END AS "when"
      FROM e ORDER BY act_symbol""")),

    // U8 (dividend shape) — positional fields 4/6/8: dollar-prefixed
    // amount, ex-date, '--'-as-NULL payable date.
    Q("u9_dividend_calendar_json", (s, dir) => {
      val ck = col("c_custkey")
      val exDate = concat(lit("2024-"),
        lpad(((ck % 12) + 1).cast("string"), 2, "0"), lit("-"),
        lpad(((ck % 28) + 1).cast("string"), 2, "0"))
      val payable = when(ck % 2 === 0, lit("--")).otherwise(lit("2024-12-15"))
      val raw = concat(
        lit("window.app_data = {\"data\": [[\"D"), ck,
        lit("\", \"a\", \"b\", \"$"), ((ck % 9) + 1).cast("string"),
        lit(".25\", \"c\", \""), exDate,
        lit("\", \"d\", \""), payable, lit("\"]]}"))
      val df = t(s, dir, "customer").select(ck, raw.as("raw"))
      CalendarExtract.dividendRows(df, col("raw"))
        // amount graded as double — the harness coerces DuckDB decimals to
        // float64 and exact Decimal-vs-float compares would false-negative
        .withColumn("amount", col("amount").cast("double"))
        .orderBy("act_symbol")
    }, Some("""
      SELECT 'D' || CAST(c_custkey AS VARCHAR) AS act_symbol,
             CAST(('2024-' || lpad(CAST((c_custkey % 12) + 1 AS VARCHAR), 2, '0')
                   || '-' || lpad(CAST((c_custkey % 28) + 1 AS VARCHAR), 2, '0'))
                  AS DATE) AS ex_date,
             CAST(CAST((c_custkey % 9) + 1 AS VARCHAR) || '.25'
                  AS DOUBLE) AS amount,
             CASE WHEN c_custkey % 2 = 0 THEN NULL
                  ELSE DATE '2024-12-15' END AS payable_date
      FROM customer ORDER BY act_symbol"""))
  )
}
