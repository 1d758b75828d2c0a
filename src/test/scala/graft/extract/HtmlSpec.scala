package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** The tolerant parser against the malformations real Zacks pages contain:
  * implicit table closes, unquoted attributes, stray end tags, comments,
  * raw script bodies, entities. */
class HtmlSpec extends AnyFunSuite {

  test("unclosed colgroup/caption do not swallow the row groups") {
    val doc = Html.parse(
      """<table><caption>t<colgroup><col><col>
        |<thead><tr><th>H1</th><th>H2</th></tr></thead>
        |<tbody><tr><td>a</td><td>b</td></tr></tbody></table>""".stripMargin)
    val grid = TableGrid.of(doc.nthDescendant("table", 1).get)
    assert(grid.head === Vector(Vector("H1", "H2")))
    assert(grid.body === Vector(Vector("a", "b")))
  }

  test("astral-plane numeric entities decode to surrogate pairs") {
    val doc = Html.parse("<p>&#x1F600; and &#x10FFFF;</p>")
    val t = doc.kid("p").get.allText
    assert(t.codePointAt(0) === 0x1F600)
    assert(t.codePointAt(t.length - 2) === 0x10FFFF)
  }

  test("implicit tr/td closes build a correct table") {
    val doc = Html.parse(
      "<table><tbody><tr><td>a<td>b<tr><td>c<td>d</tbody></table>")
    val tbody = doc.nthDescendant("tbody", 1).get
    assert(tbody.kids("tr").size === 2)
    assert(tbody.kid("tr", 2).get.kid("td", 2).get.allText === "d")
  }

  test("unquoted and single-quoted attributes, case-insensitive tags") {
    val doc = Html.parse("<DIV ID=main class='x y'><P>hi</P></DIV>")
    val div = doc.byId("div", "main").get
    assert(div.attrs("class") === "x y")
    assert(div.kid("p").get.allText === "hi")
  }

  test("stray end tags and unclosed elements do not derail the tree") {
    val doc = Html.parse("<div><span>a</b></span><p>one<p>two</div><div>z</div>")
    assert(doc.kids("div").size === 2)
    assert(doc.kids("div").head.kids("p").map(_.allText) === Vector("one", "two"))
  }

  test("comments, doctype, and script raw text are inert") {
    val doc = Html.parse(
      """<!DOCTYPE html><!-- <table><tr> --><html><head>
        |<script>if (a < b) { x = "<td>"; }</script></head>
        |<body id=home><p>ok</p></body></html>""".stripMargin)
    assert(doc.kid("html").get.kid("body").get.kid("p").get.allText === "ok")
    assert(doc.descendants.count(_.tag == "td") === 0) // script body is text
  }

  test("entities decode in text and attributes") {
    val doc = Html.parse("""<p title="a&amp;b">x &lt; y&nbsp;&#65;</p>""")
    val p = doc.kid("p").get
    assert(p.attrs("title") === "a&b")
    assert(p.allText === "x < y A")
  }

  test("lastText picks the trailing non-blank fragment of a cell") {
    val doc = Html.parse("<td><span class=lbl>label</span> 42.5 </td>")
    assert(doc.kid("td").get.lastText === "42.5")
  }

  test("firstText skips indentation text nodes") {
    val doc = Html.parse("<p>\n   <span></span>\n  1-Strong Buy\n</p>")
    assert(doc.kid("p").get.firstText === "1-Strong Buy")
  }

  test("positional kid() is 1-based and per-tag") {
    val doc = Html.parse("<div><p>a</p><span>s</span><p>b</p></div>")
    assert(doc.kid("div").get.kid("p", 2).get.allText === "b")
    assert(doc.kid("div").get.kid("p", 3).isEmpty)
  }
}
