package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Markup stripping + URL canonicalization (t32/t33 family). */
class WebTextSpec extends SparkTestBase {
  import spark.implicits._

  private def strip(html: String): String =
    Seq(html).toDF("h").select(TextAnalysis.stripMarkup(col("h")))
      .as[String].head()

  private def canon(url: String): String =
    Seq(url).toDF("u").select(TextAnalysis.canonicalUrl(col("u")))
      .as[String].head()

  // ---- stripMarkup ----

  test("stripMarkup: script/style/comment blocks vanish with content") {
    val html = "<p>keep</p><script>var x = 1 < 2;</script>" +
      "<style>p { display: none; }</style><!-- secret -->tail"
    assert(strip(html) === "keep tail")
  }

  test("stripMarkup: entities decode, &amp; last (no double-decode)") {
    // &amp;lt; must become the literal text "&lt;", NOT "<"
    assert(strip("a &lt;b&gt; &quot;c&quot; &#39;d&#39; &amp;lt; e") ===
      "a <b> \"c\" 'd' &lt; e")
  }

  test("stripMarkup: whitespace runs collapse to one space, trimmed") {
    assert(strip("  <div>\n  a\t\tb \r\n c  </div>  ") === "a b c")
  }

  test("stripMarkup: case-insensitive block tags") {
    assert(strip("x<SCRIPT a=1>boom</ScRiPt>y") === "x y")
  }

  test("markupStats: tag count is over the raw html") {
    val df = Seq((1L, "<a href='u'>t</a> plain <br>")).toDF("id", "h")
    val r = TextAnalysis.markupStats(df, "id", "h")
      .select("n_tags", "clean_text", "clean_len")
      .as[(Long, String, Long)].head()
    assert(r._1 === 3L)
    assert(r._2 === "t plain")
    assert(r._3 === 7L)
  }

  // ---- canonicalUrl ----

  test("canonicalUrl: lowercases scheme+host, strips default port") {
    assert(canon("HTTPS://WWW.Example.COM:443/Path") ===
      "https://www.example.com/Path")
    assert(canon("HTTP://a.b:80/") === "http://a.b/")
    // non-default port survives
    assert(canon("https://a.b:8443/x") === "https://a.b:8443/x")
    // :80 is NOT default for https
    assert(canon("https://a.b:80/x") === "https://a.b:80/x")
  }

  test("canonicalUrl: drops utm_*, sorts the rest, drops fragment") {
    assert(canon("https://a.b/p?z=1&utm_source=x&a=2#frag") ===
      "https://a.b/p?a=2&z=1")
    // all params tracking -> no '?' at all
    assert(canon("https://a.b/p?utm_a=1&utm_b=2") === "https://a.b/p")
  }

  test("canonicalUrl: empty path becomes /; path case preserved") {
    assert(canon("https://A.B") === "https://a.b/")
    assert(canon("https://a.b/CaseSensitive") ===
      "https://a.b/CaseSensitive")
  }

  test("urlDomain: last two labels, port ignored") {
    val d = Seq("https://deep.sub.Example.COM:8443/x").toDF("u")
      .select(TextAnalysis.urlDomain(col("u"))).as[String].head()
    assert(d === "example.com")
  }

  test("normalizeUrls: two URLs differing only in canon-irrelevant " +
    "parts collide") {
    val df = Seq(
      (1L, "HTTPS://site.com:443/p?b=2&a=1&utm_x=9#f"),
      (2L, "https://SITE.com/p?a=1&b=2")).toDF("id", "url")
    val out = TextAnalysis.normalizeUrls(df, "url")
      .select("canon_url").as[String].collect()
    assert(out.distinct.length === 1)
    assert(out.head === "https://site.com/p?a=1&b=2")
  }
}
