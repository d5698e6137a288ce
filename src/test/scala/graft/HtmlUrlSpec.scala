package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.{HtmlExtract, UrlFeatures}

/** HTML → text extraction and URL parsing/normalization — hand-computed
  * expectations, edge payloads, and determinism. */
class HtmlUrlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(HtmlExtract.extractText(col("h")))
      .head().getString(0)

  test("extractText: scripts/styles/comments dropped, blocks break lines, tags strip") {
    val html =
      """<html><head><title>T</title><style>p { color: red }</style></head>
        |<body><script type="text/js">var x = "<p>not text</p>";</script>
        |<h1>Heading</h1><p>first para</p><p>second <b>bold</b> para</p>
        |<!-- a comment with <p>markup</p> inside --><div>in a div</div></body></html>""".stripMargin
    assert(extract(html) ==
      "T\nHeading\nfirst para\nsecond bold para\nin a div")
  }

  test("extractText: entity decoding matches browser order (&amp; last)") {
    assert(extract("<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39; &amp; e&nbsp;f</p>") ==
      "a <b> \"c\" 'd' & e f")
    // double-encoded entities decode ONE level, like a browser
    assert(extract("<p>&amp;lt;literal&amp;gt;</p>") == "&lt;literal&gt;")
  }

  test("extractText: whitespace canonicalization and edges") {
    assert(extract("<p>  spaced\t\tout  </p>\n\n\n<p>next</p>") == "spaced out\nnext")
    assert(extract("") == "")
    assert(extract("plain text, no markup") == "plain text, no markup")
    // unclosed script: documented heuristic — remainder is consumed only to
    // a closing tag; with none, the block survives tag-stripped
    assert(extract("<p>before</p><script>var x = 1;") == "before\nvar x = 1;")
    // multiple script blocks each removed (non-greedy)
    assert(extract("<script>a</script><p>kept</p><script>b</script>") == "kept")
  }

  test("extractTextFromBytes decodes UTF-8 then extracts; title and linkCount") {
    val html = "<html><head><title> My &amp; Title </title></head>" +
      "<body><a href=\"/a\">x</a><A HREF='/b'>y</A><a\nhref=\"/c\">z</a>naked <a> tag</body></html>"
    val df = Seq(html.getBytes("UTF-8")).toDF("b")
    val got = df.select(
      HtmlExtract.extractTextFromBytes(col("b")),
      HtmlExtract.title(decode(col("b"), "UTF-8")),
      HtmlExtract.linkCount(decode(col("b"), "UTF-8"))).head()
    assert(got.getString(0) == "My & Title x y z naked tag")
    assert(got.getString(1) == "My & Title")
    assert(got.getInt(2) == 3, "href-bearing anchors only; the naked <a> is not a link")
  }

  test("url parsing: scheme/host/domain/path/depth/params on the crawl grammar") {
    val urls = Seq(
      "https://WWW.News.Example.COM:443/a/b/page?id=7&ref=feed#frag",
      "http://user:pw@sub.site.co.uk/x/y/z?q=1",
      "example.org/path/",
      "http://192.168.3.7:80/",
      "ftp://files.archive.net",
      "localhost")
    val got = urls.toDF("u").select(
      UrlFeatures.scheme(col("u")), UrlFeatures.host(col("u")),
      UrlFeatures.registrableDomain(col("u")), UrlFeatures.path(col("u")),
      UrlFeatures.pathDepth(col("u")), UrlFeatures.queryParamCount(col("u")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getInt(4), r.getInt(5)))
    assert(got(0) == (("https", "www.news.example.com", "example.com", "/a/b/page", 3, 2)))
    assert(got(1) == (("http", "sub.site.co.uk", "site.co.uk", "/x/y/z", 3, 1)))
    assert(got(2) == (("", "example.org", "example.org", "/path/", 1, 0)))
    assert(got(3) == (("http", "192.168.3.7", "192.168.3.7", "/", 0, 0)))
    assert(got(4) == (("ftp", "files.archive.net", "archive.net", "", 0, 0)))
    assert(got(5) == (("", "localhost", "localhost", "", 0, 0)))
  }

  test("url normalize: case, default ports, credentials, fragment, bare slash") {
    val cases = Seq(
      "HTTPS://WWW.Example.COM:443/Path/X?B=2#frag" -> "https://www.example.com/Path/X?B=2",
      "http://user@site.org:80/" -> "http://site.org",
      "http://site.org:8080/a" -> "http://site.org:8080/a",
      "site.org/" -> "site.org",
      "https://a.b/c?x=1" -> "https://a.b/c?x=1")
    val got = cases.map(_._1).toDF("u")
      .select(UrlFeatures.normalize(col("u"))).collect().map(_.getString(0))
    cases.map(_._2).zip(got).foreach { case (want, g) => assert(g == want) }
    // normalization is idempotent
    val twice = cases.map(_._2).toDF("u")
      .select(UrlFeatures.normalize(col("u"))).collect().map(_.getString(0))
    assert(twice.toSeq == cases.map(_._2))
  }
}
