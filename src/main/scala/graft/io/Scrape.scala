package graft.io

import java.net.URI
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/** HTML scraping with zero non-JDK deps (SURVEY §2.1).
  *
  * Reference: `scrape_web_data` (gofast/dataops/management.py:849) —
  * fetch a page, find all elements by tag name, optionally narrowed by
  * class and attribute values, and read their text.
  *
  * The parser is a lenient single-pass tokenizer + auto-closing tree
  * builder in the tag-soup tradition (comments, doctypes, raw-text
  * `script`/`style`, void elements, unquoted attributes, stray close
  * tags, the td/tr/li/p implied-close rules), so real-world messy
  * markup parses without a strict-XML failure. Entities are decoded in
  * text and attribute values.
  *
  * Driver-side by design (one page per call, like the reference); the
  * DataFrame bridges hand the extracted rows to the engine. A crawl at
  * scale lands raw HTML in a corpus table first and runs
  * [[Scrape.parse]] inside `mapPartitions` — the parser is a pure
  * function with no per-row service handles.
  */
object Scrape {

  /** Parsed element: name, attributes, child elements + text runs. */
  final case class Tag(name: String, attrs: Map[String, String],
                       children: Seq[Either[Tag, String]]) {
    /** Concatenated descendant text, entity-decoded. */
    def text: String =
      children.map {
        case Left(t) => t.text
        case Right(s) => s
      }.mkString
    def childTags: Seq[Tag] = children.collect { case Left(t) => t }
    /** All descendant tags, pre-order. */
    def descendants: Seq[Tag] =
      childTags.flatMap(t => t +: t.descendants)
    def attr(name: String): Option[String] = attrs.get(name)
    def classes: Set[String] =
      attrs.getOrElse("class", "").split("\\s+").filter(_.nonEmpty).toSet
  }

  /** `scrape_web_data`: fetch `url` (http/https/file) and select. */
  def scrapeWebData(url: String, element: String,
                    className: Option[String] = None,
                    attributes: Map[String, String] = Map.empty): Seq[Tag] =
    findAll(parse(fetch(url)), element, className, attributes)

  /** BeautifulSoup `find_all` semantics on a parsed document. */
  def findAll(root: Tag, element: String,
              className: Option[String] = None,
              attributes: Map[String, String] = Map.empty): Seq[Tag] =
    (root +: root.descendants).filter { t =>
      t.name == asciiLower(element) &&
        className.forall(t.classes.contains) &&
        attributes.forall { case (k, v) => t.attr(k).contains(v) }
    }

  /** Selected tags as an engine-side frame of (element, text, attrs
    * flattened to a json-ish string) — the hand-off from a driver-side
    * scrape to distributed processing. */
  def tagsToDf(spark: SparkSession, tags: Seq[Tag]): DataFrame = {
    import spark.implicits._
    tags.map { t =>
      val attrs = t.attrs.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=$v" }.mkString(";")
      (t.name, t.text.trim, attrs)
    }.toDF("element", "text", "attrs")
  }

  /** Every `<table>` in the document as a typed DataFrame: header from
    * the first row's th (or td) cells, ragged rows padded, then the
    * same narrowest-type inference the xlsx reader uses. */
  def htmlTables(spark: SparkSession, html: String): Seq[DataFrame] =
    findAll(parse(html), "table").map { table =>
      val rows = ownRows(table).map { tr =>
        tr.childTags.filter(t => t.name == "td" || t.name == "th")
          .map(_.text.trim)
      }.filter(_.nonEmpty)
      if (rows.isEmpty) TypedRows.toDf(spark, Seq.empty, Seq.empty)
      else {
        val width = rows.map(_.length).max
        val names = rows.head.zipWithIndex.map { case (h, i) =>
          if (h.isEmpty) s"_c$i" else h
        }.padTo(width, "_c").zipWithIndex.map { case (n, i) =>
          if (n == "_c") s"_c$i" else n
        }
        val data = rows.tail.map(r =>
          r.padTo(width, null.asInstanceOf[String]).toSeq)
        TypedRows.toDf(spark, names, data)
      }
    }

  /** `tr` descendants belonging to THIS table only: the walk stops at
    * nested `table` boundaries, whose rows are their own frames (a
    * layout table must not swallow an inner data table's rows). */
  private def ownRows(table: Tag): Seq[Tag] = {
    def walk(t: Tag): Seq[Tag] = t.childTags.flatMap { c =>
      if (c.name == "table") Nil
      else if (c.name == "tr") c +: walk(c)
      else walk(c)
    }
    walk(table)
  }

  /** Read a local html file / http url and extract its tables. */
  def readHtmlTables(spark: SparkSession, url: String): Seq[DataFrame] =
    htmlTables(spark, fetch(url))

  // ---------------------------------------------------------------- parser

  private val voidElements = Set("area", "base", "br", "col", "embed",
    "hr", "img", "input", "link", "meta", "param", "source", "track",
    "wbr")
  private val rawText = Set("script", "style")
  /** opening key implies closing any open element in value first */
  private val impliedClose: Map[String, Set[String]] = Map(
    "td" -> Set("td", "th"), "th" -> Set("td", "th"),
    "tr" -> Set("td", "th", "tr"), "li" -> Set("li"), "p" -> Set("p"),
    "option" -> Set("option"))

  private final class Node(val name: String,
                           val attrs: Map[String, String]) {
    val children = mutable.ArrayBuffer.empty[Either[Node, String]]
  }

  /** Lenient parse to a synthetic root tag named "#root". */
  def parse(html: String): Tag = {
    def freeze(n: Node): Tag =
      Tag(n.name, n.attrs, n.children.toSeq.map {
        case Left(c) => Left(freeze(c))
        case Right(s) => Right(s)
      })
    val root = new Node("#root", Map.empty)
    // ASCII-only lowering: locale-independent (Turkish-I safe) AND
    // length-preserving, so indexes into `lower` are valid in `html`
    val lower = asciiLower(html)
    val stack = mutable.Stack(root)
    def top = stack.top
    var i = 0
    val n = html.length
    val text = new StringBuilder
    def flushText(): Unit =
      if (text.nonEmpty) { top.children += Right(decode(text.result())); text.clear() }
    while (i < n) {
      val c = html.charAt(i)
      if (c != '<') { text += c; i += 1 }
      else if (html.startsWith("<!--", i)) {
        flushText()
        val e = html.indexOf("-->", i + 4)
        i = if (e < 0) n else e + 3
      } else if (i + 1 < n &&
          (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
        flushText()
        val e = html.indexOf('>', i)
        i = if (e < 0) n else e + 1
      } else if (i + 1 < n && html.charAt(i + 1) == '/') {
        flushText()
        val e = html.indexOf('>', i)
        val name = asciiLower(html.substring(i + 2, if (e < 0) n else e)
          .trim)
        i = if (e < 0) n else e + 1
        // lenient close: pop to the matching open if one exists
        // children are attached to their parent at open time, so a
        // pop is just a cursor move
        if (stack.exists(nd => nd.name == name)) {
          while (top.name != name) stack.pop()
          stack.pop()
        } // else stray close tag: ignore
      } else if (i + 1 < n && (html.charAt(i + 1).isLetter)) {
        flushText()
        val (node, selfClosed, next) = openTag(html, i)
        i = next
        impliedClose.get(node.name).foreach { closers =>
          while (stack.size > 1 && closers.contains(top.name)) stack.pop()
        }
        if (selfClosed || voidElements.contains(node.name))
          top.children += Left(node)
        else if (rawText.contains(node.name)) {
          // raw-text element: consume until the matching close tag
          val close = s"</${node.name}"
          val e = lower.indexOf(close, i)
          val end = if (e < 0) n else e
          node.children += Right(html.substring(i, end))
          top.children += Left(node)
          i = if (e < 0) n else {
            val gt = html.indexOf('>', e)
            if (gt < 0) n else gt + 1
          }
        } else {
          top.children += Left(node)
          stack.push(node)
        }
      } else { text += c; i += 1 } // lone '<' in text
    }
    flushText()
    stack.clear() // children already attached at open time
    freeze(root)
  }

  /** Parse one open tag at `html(start) == '<'`; returns the node,
    * whether it self-closed, and the index just past '>'. Unquoted,
    * single- and double-quoted and bare (valueless) attributes are
    * accepted; attribute values are entity-decoded. */
  private def openTag(html: String, start: Int): (Node, Boolean, Int) = {
    val n = html.length
    var i = start + 1
    val nameSb = new StringBuilder
    while (i < n && (html.charAt(i).isLetterOrDigit ||
        html.charAt(i) == '-' || html.charAt(i) == ':')) {
      nameSb += html.charAt(i); i += 1
    }
    val attrs = mutable.LinkedHashMap.empty[String, String]
    var selfClosed = false
    var done = false
    while (!done && i < n) {
      while (i < n && html.charAt(i).isWhitespace) i += 1
      if (i >= n) done = true
      else html.charAt(i) match {
        case '>' => i += 1; done = true
        case '/' =>
          if (i + 1 < n && html.charAt(i + 1) == '>') {
            selfClosed = true; i += 2; done = true
          } else i += 1
        case _ =>
          val kSb = new StringBuilder
          while (i < n && !html.charAt(i).isWhitespace &&
              html.charAt(i) != '=' && html.charAt(i) != '>' &&
              html.charAt(i) != '/') {
            kSb += html.charAt(i); i += 1
          }
          while (i < n && html.charAt(i).isWhitespace) i += 1
          var v: String = null
          if (i < n && html.charAt(i) == '=') {
            i += 1
            while (i < n && html.charAt(i).isWhitespace) i += 1
            if (i < n && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
              val q = html.charAt(i)
              val e = html.indexOf(q, i + 1)
              v = html.substring(i + 1, if (e < 0) n else e)
              i = if (e < 0) n else e + 1
            } else {
              val vSb = new StringBuilder
              while (i < n && !html.charAt(i).isWhitespace &&
                  html.charAt(i) != '>') {
                vSb += html.charAt(i); i += 1
              }
              v = vSb.result()
            }
          }
          if (kSb.nonEmpty)
            attrs(asciiLower(kSb.result())) =
              if (v == null) "" else decode(v)
      }
    }
    (new Node(asciiLower(nameSb.result()), attrs.toMap), selfClosed, i)
  }

  /** Locale-independent, length-preserving ASCII lowercase (the JDK
    * default-locale toLowerCase turns SCRIPT into scr\u0131pt under
    * tr_TR and can change string length via U+0130). */
  private def asciiLower(s: String): String = {
    var i = 0
    while (i < s.length && !(s.charAt(i) >= 'A' && s.charAt(i) <= 'Z')) i += 1
    if (i == s.length) return s
    val a = s.toCharArray
    while (i < a.length) {
      val c = a(i)
      if (c >= 'A' && c <= 'Z') a(i) = (c + 32).toChar
      i += 1
    }
    new String(a)
  }

  /** Entity decode: named basics + numeric/hex references. */
  private def decode(s: String): String = {
    if (!s.contains('&')) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val rep: String = ent match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" => " "
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              // Character.toChars: code points past U+FFFF need a
              // surrogate pair, toChar would truncate emoji/CJK-B
              try new String(Character.toChars(
                Integer.parseInt(e.substring(2), 16)))
              catch { case _: Exception => null }
            case e if e.startsWith("#") =>
              try new String(Character.toChars(
                Integer.parseInt(e.substring(1))))
              catch { case _: Exception => null }
            case _ => null
          }
          if (rep != null) { out ++= rep; i = semi + 1 }
          else { out += c; i += 1 }
        } else { out += c; i += 1 }
      } else { out += c; i += 1 }
    }
    out.result()
  }

  private def fetch(url: String): String = {
    val in =
      if (url.startsWith("http://") || url.startsWith("https://") ||
          url.startsWith("file://"))
        new URI(url).toURL.openStream()
      else new java.io.FileInputStream(url)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }
}
