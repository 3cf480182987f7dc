package graft

import org.apache.spark.sql.functions._
import graft.text.Urls

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("u").select(Urls.normalizeUrl(col("u")).as("n"))
      .as[String].head()

  test("normalizeUrl canonicalizes each component") {
    // scheme+host lowercase, path case preserved
    assert(norm("HTTP://Example.COM/Path") == "http://example.com/Path")
    // fragment, default port, www
    assert(norm("https://www.example.com:443/a#sec") ==
      "https://example.com/a")
    assert(norm("http://example.com:80/") == "http://example.com")
    // non-default port survives
    assert(norm("http://example.com:8080/x") == "http://example.com:8080/x")
    // tracking params drop, real ones stay, separators tidy
    assert(norm("https://e.com/p?utm_source=a&q=1&fbclid=z") ==
      "https://e.com/p?q=1")
    assert(norm("https://e.com/p?utm_a=1&utm_b=2") == "https://e.com/p")
    // INTERIOR tracking params: the doubled separator must collapse so
    // the URL dedups against its clean twin
    assert(norm("https://e.com/p?a=1&utm_x=2&b=4") ==
      "https://e.com/p?a=1&b=4")
    assert(norm("https://e.com/p?utm_a=1&utm_b=2&q=1") ==
      "https://e.com/p?q=1")
    // trailing slash strips; whitespace trims
    assert(norm("  https://e.com/dir/  ") == "https://e.com/dir")
    // the PATH slash strips even with a query attached, and a query
    // value ending in '/' is never rewritten
    assert(norm("https://e.com/dir/?q=1") == "https://e.com/dir?q=1")
    assert(norm("https://e.com/p?next=/") == "https://e.com/p?next=/")
  }

  test("normalizeUrl passes garbage through trimmed, not mutated") {
    assert(norm(" not a url ") == "not a url")
    assert(norm("ftp://Mixed.Case/X") == "ftp://mixed.case/X")
  }

  test("dedupByUrl keeps the min-id row per canonical URL") {
    val df = Seq(
      (3L, "https://www.e.com/a?utm_x=1", "later"),
      (1L, "HTTPS://e.com/a", "first"),
      (2L, "https://other.com/b", "only")
    ).toDF("id", "url", "payload")
    val out = Urls.dedupByUrl(df, "id", "url").orderBy("id")
      .as[(Long, String, String)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    assert(out(0)._3 == "first")
  }
}
