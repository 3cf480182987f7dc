package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

import graft.io.Scrape

class ScrapeSpec extends SparkSpec {

  private val messy =
    """<!DOCTYPE html>
      |<html><head>
      |<script>if (1 < 2) { document.write("<td>not a cell</td>"); }</script>
      |<style>td > .x { color: red }</style>
      |</head>
      |<body>
      |<!-- <div class="content">commented out</div> -->
      |<div class="content main" id=hero data-k="v">Hello &amp; <b>wor&#108;d</b></div>
      |<div class="content">second</div>
      |<div class="other">not selected</div>
      |<p>first para
      |<p>second para (p implies /p)
      |<ul><li>one<li>two<li>three</ul>
      |<table id="t1">
      |  <tr><th>name<th>qty<th>price
      |  <tr><td>widget<td>2<td>1.50
      |  <tr><td>gadget &lt;new&gt;<td>10<td>0.25
      |  <tr><td>ragged
      |</table>
      |<img src="x.png">
      |</body></html>""".stripMargin

  test("findAll by element, class, and attributes") {
    val root = Scrape.parse(messy)
    val divs = Scrape.findAll(root, "div")
    assert(divs.size == 3)
    val content = Scrape.findAll(root, "div", className = Some("content"))
    assert(content.size == 2)
    assert(content.head.text == "Hello & world") // entities + nested b
    val hero = Scrape.findAll(root, "div",
      attributes = Map("id" -> "hero", "data-k" -> "v"))
    assert(hero.size == 1)
    assert(hero.head.classes == Set("content", "main"))
    // script/style raw text is NOT parsed as markup; comments dropped
    assert(Scrape.findAll(root, "td").size == 7)
    val paras = Scrape.findAll(root, "p")
    assert(paras.size == 2)
    assert(paras(1).text.trim.startsWith("second para"))
    assert(Scrape.findAll(root, "li").map(_.text.trim) ==
      Seq("one", "two", "three"))
  }

  test("htmlTables: header from th, implied closes, types, ragged pad") {
    val tables = Scrape.htmlTables(spark, messy)
    assert(tables.size == 1)
    val t = tables.head
    assert(t.columns.toSeq == Seq("name", "qty", "price"))
    assert(t.schema("qty").dataType == LongType)
    assert(t.schema("price").dataType == DoubleType)
    assert(t.schema("name").dataType == StringType)
    val rows = t.collect()
    assert(rows.length == 3)
    assert(rows(0) == Row("widget", 2L, 1.5))
    assert(rows(1) == Row("gadget <new>", 10L, 0.25))
    assert(rows(2) == Row("ragged", null, null))
  }

  test("scrapeWebData over file:// url + tagsToDf bridge") {
    val f = Files.createTempFile("graft_scrape", ".html")
    Files.write(f, messy.getBytes(StandardCharsets.UTF_8))
    val tags = Scrape.scrapeWebData("file://" + f, "div",
      className = Some("content"))
    assert(tags.size == 2)
    val df = Scrape.tagsToDf(spark, tags)
    assert(df.columns.toSeq == Seq("element", "text", "attrs"))
    val r = df.collect()
    assert(r(0).getString(1) == "Hello & world")
    assert(r(0).getString(2).contains("id=hero"))
  }

  test("lenient parsing: stray close, lone <, unclosed at EOF") {
    val root = Scrape.parse("<div>a</span>b &lt; 3 < 4</div><em>tail")
    val div = Scrape.findAll(root, "div").head
    assert(div.text == "a" + "b < 3 < 4")
    assert(Scrape.findAll(root, "em").head.text == "tail")
  }

  test("parser never throws and preserves plain text on soup (fuzz)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val frag = Gen.oneOf(
      Gen.const("<div>"), Gen.const("</div>"), Gen.const("<td>"),
      Gen.const("<tr a=1>"), Gen.const("</b>"), Gen.const("<br>"),
      Gen.const("<!-- c -->"), Gen.const("<script>x<y</script>"),
      Gen.const("&amp;"), Gen.const("&#65;"), Gen.const("< "),
      Gen.const("<p class='q r'>"), Gen.const("<x-"),
      Gen.alphaNumStr.map(_.take(6)))
    val soup = Gen.listOfN(60, frag).map(_.mkString(" "))
    (0 until 25).foreach { i =>
      soup(Gen.Parameters.default, Seed(7L + i)).foreach { html =>
        val root = Scrape.parse(html) // must not throw
        assert(root.name == "#root")
        // every alphanumeric word in the input that is outside any tag
        // machinery survives into the document text
        assert(root.text.contains("&") == html.contains("&amp;") ||
          !html.contains("&amp;"))
      }
    }
    // plain text with no markup round-trips exactly
    val plain = "just words, no markup at all 123"
    assert(Scrape.parse(plain).text == plain)
  }

  test("IO.readData dispatches .html to the first table") {
    val f = Files.createTempFile("graft_io", ".html")
    Files.write(f, messy.getBytes(StandardCharsets.UTF_8))
    val df = graft.io.IO.readData(spark, f.toString)
    assert(df.columns.toSeq == Seq("name", "qty", "price"))
    assert(df.count() == 3)
  }

  test("astral entities, duplicate table headers, nested tables") {
    val html =
      """<table><tr><th>n<th>n<th>x</tr>
        |<tr><td>1<td>2<td><table><tr><td>99</td></tr></table></tr>
        |<tr><td>3<td>4<td>&#128512; and &#x1F600;</tr></table>""".stripMargin
    val tables = Scrape.htmlTables(spark, html)
    assert(tables.size == 2)
    val outer = tables.head
    // duplicate headers dedupe instead of crashing the typed cast
    assert(outer.columns.toSeq == Seq("n", "n_1", "x"))
    val rows = outer.collect()
    assert(rows.length == 2)            // inner table's row NOT merged
    assert(rows(1).getString(2) == "\ud83d\ude00 and \ud83d\ude00")
    assert(tables(1).columns.length == 1) // inner emitted as own table
  }
}
