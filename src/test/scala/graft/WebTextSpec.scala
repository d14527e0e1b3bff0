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

  // ---- sentence segmentation ----

  test("sentences: terminator runs split, final punctuation stays on " +
    "the last sentence") {
    val df = Seq((1L, "First one. Second!! Third?? The last one."))
      .toDF("doc_id", "text")
    val out = TextAnalysis.sentences(df, "doc_id", "text")
      .orderBy("sentence_idx")
      .select("sentence_idx", "sentence", "n_chars")
      .as[(Int, String, Long)].collect()
    assert(out.map(_._2).toSeq === Seq(
      "First one", "Second", "Third", "The last one."))
    assert(out.map(_._1).toSeq === Seq(1, 2, 3, 4))
    assert(out.head._3 === 9L)
  }

  test("sentences: empty pieces are dropped but keep index gaps") {
    // ". . x" -> raw parts ("", "", "x"... actually ". " then ". "
    val df = Seq((1L, "a. .  b.   ")).toDF("doc_id", "text")
    val out = TextAnalysis.sentences(df, "doc_id", "text")
      .orderBy("sentence_idx")
      .select("sentence_idx", "sentence").as[(Int, String)].collect()
    assert(out.map(_._2).forall(_.nonEmpty))
    assert(out.map(_._1).toSeq === out.map(_._1).toSeq.sorted)
  }

  // ---- PII scrubbing ----

  test("scrubPii: each category redacts to its token") {
    val s = Seq((1L,
      "mail a.b+c@test.org, card 4111 1111 1111 1234, " +
        "ssn 123-45-6789, call +15551234567, host 192.168.0.1 end"))
      .toDF("id", "t")
      .select(TextAnalysis.scrubPii(col("t"))).as[String].head()
    assert(s === "mail <EMAIL>, card <CC>, ssn <ID>, call <PHONE>, " +
      "host <IP> end")
  }

  test("piiReport: per-category counts match what the chained scrub " +
    "replaces") {
    val df = Seq(
      (1L, "x@y.io and z@w.co plus 10.0.0.1"),
      (2L, "clean text, no secrets"),
      (3L, "123-45-6789 123-45-0000")).toDF("doc_id", "text")
    val out = TextAnalysis.piiReport(df, "doc_id", "text")
      .orderBy("doc_id")
      .select("n_email", "n_ip", "n_ssn", "n_pii")
      .as[(Long, Long, Long, Long)].collect()
    assert(out(0) === ((2L, 1L, 0L, 3L)))
    assert(out(1) === ((0L, 0L, 0L, 0L)))
    assert(out(2) === ((0L, 0L, 2L, 2L)))
  }

  test("piiReport: cross-category overlap is attributed once, to the " +
    "first pattern in the chain") {
    // the SSN-shaped local part is INSIDE the email span; the email
    // replacement consumes the whole span, so n_ssn must be 0 and n_pii
    // must equal the number of actual replacements in the scrubbed text
    val out = TextAnalysis.piiReport(
      Seq((1L, "mail 123-45-6789@foo.com ok")).toDF("doc_id", "text"),
      "doc_id", "text")
      .select("n_email", "n_ssn", "n_pii", "scrubbed")
      .as[(Long, Long, Long, String)].head()
    assert(out._1 === 1L)
    assert(out._2 === 0L)
    assert(out._3 === 1L)
    assert(out._4 === "mail <EMAIL> ok")
  }

  test("scrubPii: ordering protects the credit card from the partial " +
    "SSN-shape and boundaries hold") {
    // 4-4-4-4 digit groups must become <CC>, never a partial <ID> hit;
    // a 5-octet dotted run is NOT an IP (no \b match on the inner run)
    val r = Seq((1L, "4111-1111-1111-1111 and 1.2.3.4.5"))
      .toDF("id", "t")
      .select(TextAnalysis.scrubPii(col("t"))).as[String].head()
    assert(r.contains("<CC>"))
    assert(!r.contains("<ID>"))
  }

  test("unicodeNormalize: NFC collapses combining sequences so " +
    "canonical-equivalent spellings fingerprint identically") {
    import graft.functions.GraftFunctions.unicodeNormalize
    val out = Seq(
      (1L, "cafe\u0301"),  // e + combining acute (decomposed)
      (2L, "caf\u00e9"),   // precomposed
      (3L, "plain ascii"),
      (4L, "A\u030a"))     // A + combining ring -> U+00C5
      .toDF("id", "t")
      .select(col("id"), unicodeNormalize(col("t")).as("n"),
        length(unicodeNormalize(col("t"))).as("len"))
      .orderBy("id").as[(Long, String, Int)].collect()
    assert(out(0)._2 === out(1)._2) // the dedup property
    assert(out(0)._3 === 4)
    assert(out(2)._2 === "plain ascii") // identity on normalized input
    assert(out(3)._2 === "\u00c5")
    // NFKC additionally folds compatibility forms (the fi ligature)
    val nfkc = Seq(Tuple1("e\ufb01cient")).toDF("t")
      .select(unicodeNormalize(col("t"), "NFKC")).as[String].head()
    assert(nfkc === "eficient")
    // nulls pass through; bad form refused loudly
    val n = Seq(Tuple1(null: String)).toDF("t")
      .select(unicodeNormalize(col("t"))).as[String].head()
    assert(n === null)
    intercept[IllegalArgumentException] {
      Seq(Tuple1("x")).toDF("t")
        .select(unicodeNormalize(col("t"), "NFX")).collect()
    }
  }

  test("urlDomainPsl: multi-label registry suffixes keep three labels, " +
    "plain TLDs keep two, sub-2-label hosts fall back") {
    val out = Seq(
      "https://www.shop.co.uk/a",        // PSL: shop.co.uk
      "http://a.b.site.com.au:80/x",     // PSL: site.com.au
      "https://deep.sub.example.com/y",  // plain: example.com
      "https://co.uk/",                  // bare suffix: 2 labels -> naive
      "https://localhost/z")             // 1 label: no domain
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
      .select(col("id"), TextAnalysis.urlDomainPsl(col("url")).as("d"))
      .orderBy("id").as[(Long, String)].collect().map(_._2)
    assert(out === Array("shop.co.uk", "site.com.au", "example.com",
      "co.uk", ""))
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
