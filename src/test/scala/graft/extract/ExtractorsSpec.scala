package graft.extract

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

/** Extractor fixtures per FIXTURES.md §2-3: layout-era addressing for
  * rank/style, table-cell addressing with section/row/column arithmetic,
  * the equity row-9 skip, and the income period-offset. */
class ExtractorsSpec extends AnyFunSuite {

  private def ribbonDoc(hero: Boolean, styleDiv: Int,
                        pipeSpans: Boolean): String = {
    val spans =
      if (pipeSpans)
        "<span>A</span><span>|</span><span>B</span><span>|</span><span>C</span><span>|</span><span>D</span>"
      else "<span>A</span><span>B</span><span>C</span><span>D</span>"
    val styles = s"<div><p>$spans</p></div>"
    val inner = styleDiv match {
      case 2 => s"<div><p>\n<span></span>\n2-Buy\n</p></div>$styles"
      case 3 => s"<div><p>\n<span></span>\n2-Buy\n</p></div><div></div>$styles"
    }
    val ribbon =
      s"""<section id="quote_ribbon_v2"><div></div><div>$inner</div></section>"""
    val wrapped =
      if (hero) s"""<section class="quote_page_hero_section">$ribbon</section>"""
      else ribbon
    s"""<html><body id="home"><div id="main_content">
       |<div id="right_content">$wrapped</div></div></body></html>""".stripMargin
  }

  test("U2 rank follows the 2024-11-10 hero-section move") {
    val pre = Html.parse(ribbonDoc(hero = false, styleDiv = 2, pipeSpans = true))
    val post = Html.parse(ribbonDoc(hero = true, styleDiv = 2, pipeSpans = true))
    assert(EstimateExtract.rank(pre, LocalDate.of(2024, 1, 1)) === "Buy")
    assert(EstimateExtract.rank(post, LocalDate.of(2025, 1, 1)) === "Buy")
    // wrong-era path finds nothing rather than the wrong node
    assert(EstimateExtract.rank(post, LocalDate.of(2024, 1, 1)) === "")
  }

  test("U3 style scores across all four sxpath eras") {
    // era <2018-10-07: div2, plain span n
    val e0 = Html.parse(ribbonDoc(hero = false, styleDiv = 2, pipeSpans = false))
    assert(EstimateExtract.styleScore(e0, LocalDate.of(2018, 1, 1), 3) === "C")
    // era <2020-07-04: div3, plain span n
    val e1 = Html.parse(ribbonDoc(hero = false, styleDiv = 3, pipeSpans = false))
    assert(EstimateExtract.styleScore(e1, LocalDate.of(2019, 6, 1), 4) === "D")
    // era <2020-09-20: div3, pipe spans (2n-1)
    val e2 = Html.parse(ribbonDoc(hero = false, styleDiv = 3, pipeSpans = true))
    assert(EstimateExtract.styleScore(e2, LocalDate.of(2020, 8, 1), 2) === "B")
    // era <2024-11-10: div2, pipe spans
    val e3 = Html.parse(ribbonDoc(hero = false, styleDiv = 2, pipeSpans = true))
    assert(EstimateExtract.styleScore(e3, LocalDate.of(2022, 1, 1), 1) === "A")
    // hero era: wrapped, div2, pipe spans
    val e4 = Html.parse(ribbonDoc(hero = true, styleDiv = 2, pipeSpans = true))
    assert(EstimateExtract.styleScore(e4, LocalDate.of(2025, 1, 1), 4) === "D")
  }

  private val estimateDoc =
    """<html><body id="home">
      |<section id="detailed_earnings_estimates">
      |<table><thead><tr><th>x</th><th>(3/2025)</th><th>(6/2025)</th><th>(12/2025)</th><th>(12/2026)</th></tr></thead>
      |<tbody>
      |<tr><td>Consensus</td><td>10.5</td><td>11</td><td>12</td><td>13</td></tr>
      |<tr><td>Count</td><td>7</td><td>8</td><td>9</td><td>10</td></tr>
      |<tr><td>High</td><td>1,000.5M</td><td>2B</td><td>3T</td><td>NA</td></tr>
      |<tr><td>Low</td><td>1</td><td>2</td><td>3</td><td>4</td></tr>
      |<tr><td>Year Ago</td><td>5</td><td>6</td><td>7</td><td>8</td></tr>
      |</tbody></table>
      |<table><thead><tr><th>x</th><th>(3/2025)</th><th>(6/2025)</th><th>(12/2025)</th><th>(12/2026)</th></tr></thead>
      |<tbody>
      |<tr><td>Consensus</td><td>1.5</td><td>1.6</td><td>1.7</td><td>1.8</td></tr>
      |<tr><td>Count</td><td>3</td><td>4</td><td>5</td><td>6</td></tr>
      |<tr><td>Recent</td><td>1.4</td><td>1.5</td><td>1.6</td><td>1.7</td></tr>
      |<tr><td>High</td><td>2</td><td>(2.1)</td><td>2.2</td><td>2.3</td></tr>
      |<tr><td>Low</td><td>1</td><td>1.1</td><td>M</td><td>1.3</td></tr>
      |<tr><td>Year Ago</td><td>0.9</td><td>1.0</td><td>1.1</td><td>1.2</td></tr>
      |</tbody></table>
      |</section></body></html>""".stripMargin

  test("U1 sales/eps share a section: first vs second table, row offsets") {
    val p = EstimateExtract.parse(estimateDoc, LocalDate.of(2025, 1, 1))
    def cell(section: String, period: String, entry: String): String =
      p.cells(EstimateExtract.cellKey(section, period))(entry)
    // sales = 1st table, offset 0: high is row 3
    assert(cell("sales-estimates", "current-quarter", "consensus") === "10.5")
    assert(cell("sales-estimates", "current-quarter", "high") === "1000.5e6")
    assert(cell("sales-estimates", "next-quarter", "high") === "2e9")
    assert(cell("sales-estimates", "current-year", "high") === "3e12")
    assert(cell("sales-estimates", "next-year", "high") === "NA")
    // eps = 2nd table, offset 1: recent row 3, high row 4
    assert(cell("eps-estimates", "current-quarter", "recent") === "1.4")
    assert(cell("eps-estimates", "next-quarter", "high") === "2.1") // parens stripped
    assert(cell("eps-estimates", "current-year", "low") === "NA")   // bare M
    assert(cell("eps-estimates", "current-quarter", "date") === "3/2025")
  }

  private def balanceDoc: String = {
    def tbl(rows: Int, mark: String): String = {
      val body = (1 to rows).map { r =>
        "<tr><td>label</td>" + (2 to 6).map(c => s"<td>$mark$r-$c</td>").mkString + "</tr>"
      }.mkString
      s"""<table><thead><tr><th>h</th><th>3/31/2024</th><th>12/31/2023</th><th>9/30/2023</th><th>6/30/2023</th><th>3/31/2023</th></tr></thead><tbody>$body</tbody></table>"""
    }
    s"""<html><body id="home">
       |<div id="annual_income_statement">${tbl(14, "a")}${tbl(16, "l")}${tbl(11, "e")}</div>
       |<div id="quarterly_income_statement">${tbl(14, "qa")}${tbl(16, "ql")}${tbl(11, "qe")}</div>
       |</body></html>""".stripMargin
  }

  test("U4 balance sheet: 3 tables, both periods, equity row-9 skip") {
    val p = StatementExtract.parseBalanceSheet(balanceDoc)
    assert(p.rows.size === 10) // 2 periods x 5 date columns
    val a1 = p.rows.find(r => r.period == "annual" && r.dateIdx == 1).get
    assert(a1.entries("date") === "3/31/2024")
    assert(a1.entries("cash_and_equivalents") === "a2-2")
    assert(a1.entries("total_assets") === "a14-2")
    assert(a1.entries("total_liabilities") === "l16-2")
    // equity: shares_outstanding row 10, book_value row 11 (row 9 skipped)
    assert(a1.entries("shares_outstanding") === "e10-2")
    assert(a1.entries("book_value_per_share") === "e11-2")
    val q3 = p.rows.find(r => r.period == "quarterly" && r.dateIdx == 3).get
    assert(q3.entries("retained_earnings") === "qe4-4")
  }

  test("U5 income statement period-offset: per-share table shifts on annual") {
    def tbl(rows: Int, mark: String): String = {
      val body = (1 to rows).map { r =>
        "<tr><td>l</td>" + (2 to 6).map(c => s"<td>$mark$r-$c</td>").mkString + "</tr>"
      }.mkString
      s"""<table><thead><tr><th>h</th><th>12/31/23</th><th>12/31/22</th><th>12/31/21</th><th>12/31/20</th><th>12/31/19</th></tr></thead><tbody>$body</tbody></table>"""
    }
    val doc =
      s"""<html><body id="home">
         |<div id="annual_income_statement">${tbl(15, "m")}${tbl(2, "d")}${tbl(3, "s")}</div>
         |<div id="quarterly_income_statement">${tbl(15, "qm")}${tbl(3, "qs")}</div>
         |</body></html>""".stripMargin
    val p = StatementExtract.parseIncomeStatement(doc)
    val annual = p.rows.find(r => r.period == "annual" && r.dateIdx == 1).get
    val quarterly = p.rows.find(r => r.period == "quarterly" && r.dateIdx == 1).get
    assert(annual.entries("sales") === "m1-2")
    assert(annual.entries("depreciation_and_amortization") === "d2-2")
    assert(annual.entries("average_shares") === "s1-2")    // table 2+1
    assert(quarterly.entries("average_shares") === "qs1-2") // table 2+0
  }

  test("U6/U7 cash-flow layouts address the same entries differently") {
    def tbl(rows: Int, mark: String): String = {
      val body = (1 to rows).map { r =>
        "<tr><td>l</td>" + (2 to 6).map(c => s"<td>$mark$r-$c</td>").mkString + "</tr>"
      }.mkString
      s"""<table><thead><tr><th>h</th><th>12/31/2023</th><th>12/31/2022</th><th>12/31/2021</th><th>12/31/2020</th><th>12/31/2019</th></tr></thead><tbody>$body</tbody></table>"""
    }
    val legacy =
      s"""<html><body id="home">
         |<section id="cash_flow_operation">${tbl(12, "o")}</section>
         |<section id="cash_flow_use">${tbl(11, "u")}</section>
         |</body></html>""".stripMargin
    val pl = StatementExtract.parseCashFlowLegacy(legacy)
    assert(pl.rows.size === 5) // annual only
    val r1 = pl.rows.find(_.dateIdx === 1).get
    assert(r1.entries("net_income") === "o2-2")           // tbody row 2!
    assert(r1.entries("issuance_of_capital_stock") === "u1-2")
    assert(r1.entries("diluted_net_eps") === "u11-2")

    val v2024 =
      s"""<html><body id="home">
         |<div id="annual_cash_flow_statement"><div>${tbl(12, "a")}</div><div>${tbl(11, "b")}</div></div>
         |<div id="quarterly_cash_flow_statement"><div>${tbl(12, "qa")}</div><div>${tbl(11, "qb")}</div></div>
         |</body></html>""".stripMargin
    val p2 = StatementExtract.parseCashFlow2024(v2024)
    assert(p2.rows.size === 10) // both periods
    val q2 = p2.rows.find(r => r.period == "quarterly" && r.dateIdx == 2).get
    assert(q2.entries("net_income") === "qa2-3")
    assert(q2.entries("cash_at_end_of_period") === "qb10-3")
  }
}
