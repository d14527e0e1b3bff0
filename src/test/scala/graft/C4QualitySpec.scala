package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** [[GraftFunctions.C4Stats]] and [[GraftFunctions.GopherQuality]] vs
  * independent in-test reference implementations, on hand fixtures and
  * seeded generated strings, plus the SQL registration surface.
  */
class C4QualitySpec extends SparkTestBase {
  import spark.implicits._

  /** Space-only trim — the SQL `trim()` contract both engines use. */
  private def sqlTrim(s: String): String =
    s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse

  // ---------- independent C4 reference ----------
  private case class C4Ref(clean: String, nLines: Int, nKept: Int,
      nSentences: Int, hasLorem: Boolean, hasBrace: Boolean,
      hasBad: Boolean, keep: Boolean)

  private def c4Ref(text: String): C4Ref = {
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val lines = text.split("\n", -1)
    val kept = lines.map(sqlTrim).filter { t =>
      t.nonEmpty && ".!?\"".contains(t.last) &&
        t.split("\\s+", -1).length >= 3 &&
        !t.toLowerCase(java.util.Locale.ROOT).contains("javascript")
    }
    val clean = kept.mkString("\n")
    val sentences = clean.count(c => c == '.' || c == '!' || c == '?')
    val lorem = lower.contains("lorem ipsum")
    val brace = text.contains("{")
    val bad = GraftFunctions.C4Stats.badWords.exists(lower.contains)
    C4Ref(clean, lines.length, kept.length, sentences, lorem, brace, bad,
      sentences >= 5 && !lorem && !brace && !bad)
  }

  private def runC4(texts: Seq[String]): Seq[C4Ref] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .withColumn("c", GraftFunctions.c4Stats(col("text")))
      .orderBy("id")
      .select(col("c.clean_text"), col("c.n_lines"), col("c.n_kept"),
        col("c.n_sentences"), col("c.has_lorem"), col("c.has_brace"),
        col("c.has_bad"), col("c.keep"))
      .collect().toSeq.map(r => C4Ref(r.getString(0), r.getInt(1),
        r.getInt(2), r.getInt(3), r.getBoolean(4), r.getBoolean(5),
        r.getBoolean(6), r.getBoolean(7)))

  test("c4: hand fixtures match the closed forms") {
    val doc = "one two three.\nshort.\nno punct line\n" +
      "enable JavaScript now.\nfour five six!"
    val Seq(r) = runC4(Seq(doc))
    // line 2 has < 3 words, line 3 lacks terminal punct, line 4 says
    // javascript (case-insensitive); 1 and 5 survive
    assert(r.clean === "one two three.\nfour five six!")
    assert(r.nLines === 5 && r.nKept === 2 && r.nSentences === 2)
    assert(!r.keep) // < 5 sentences
  }

  test("c4: five clean sentences keep; page flags veto") {
    val five = (1 to 5).map(i => s"alpha beta gamma $i.").mkString("\n")
    val Seq(ok, lorem, brace, bad) = runC4(Seq(five,
      five + "\nsome Lorem Ipsum filler.", five + "\ncode { here.",
      five + "\nwith badword inside."))
    assert(ok.keep && ok.nSentences === 5)
    assert(lorem.hasLorem && !lorem.keep)
    assert(brace.hasBrace && !brace.keep)
    assert(bad.hasBad && !bad.keep)
  }

  test("c4: quote terminal, space trim, and empty text") {
    val Seq(q, sp, e) = runC4(Seq("she said \"go home\"",
      "   x y z.   \nuntrimmed junk", ""))
    assert(q.nKept === 1 && q.clean === "she said \"go home\"")
    assert(sp.clean === "x y z.") // kept lines are the TRIMMED lines
    assert(e.nLines === 1 && e.nKept === 0 && e.clean === "")
  }

  // ---------- independent Gopher-quality reference ----------
  private case class GqRef(words: Long, meanLen: Double, hashFrac: Double,
      ellFrac: Double, bulletFrac: Double, ellLineFrac: Double,
      alphaFrac: Double, stopwords: Long, keep: Boolean)

  private def gqRef(text: String): GqRef = {
    val toks = sqlTrim(text).split("\\s+", -1)
    val words = toks.length.toLong
    val chars = toks.map(_.length.toLong).sum // ASCII fixtures
    val alpha = toks.count(_.exists(c => c.isLetter && c <= 'z')).toLong
    val stops = toks.count(GraftFunctions.GopherQuality.stopwords).toLong
    val hashes = text.count(_ == '#').toLong
    var ell = 0L
    var at = text.indexOf("...")
    while (at >= 0) { ell += 1; at = text.indexOf("...", at + 3) }
    val lines = text.split("\n", -1)
    val bullets = lines.map(sqlTrim).count(t =>
      t.nonEmpty && "-*•".contains(t.head)).toLong
    val ellLines = lines.map(sqlTrim).count(_.endsWith("...")).toLong
    val n = lines.length.toLong
    def f(a: Long, b: Long) = if (b > 0) a.toDouble / b else 0.0
    val meanLen = f(chars, words)
    val keep = words >= 50 && words <= 100000 &&
      meanLen >= 3.0 && meanLen <= 10.0 &&
      f(hashes, words) < 0.1 && f(ell, words) < 0.1 &&
      f(bullets, n) <= 0.9 && f(ellLines, n) <= 0.3 &&
      f(alpha, words) >= 0.8 && stops >= 2
    GqRef(words, meanLen, f(hashes, words), f(ell, words), f(bullets, n),
      f(ellLines, n), f(alpha, words), stops, keep)
  }

  private def runGq(texts: Seq[String]): Seq[GqRef] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .withColumn("g", GraftFunctions.gopherQuality(col("text")))
      .orderBy("id")
      .select(col("g.word_count"), col("g.mean_word_len"),
        col("g.hash_frac"), col("g.ellipsis_frac"),
        col("g.bullet_line_frac"), col("g.ellipsis_line_frac"),
        col("g.alpha_word_frac"), col("g.stopword_count"), col("g.keep"))
      .collect().toSeq.map(r => GqRef(r.getLong(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6), r.getLong(7), r.getBoolean(8)))

  test("gopher quality: hand fixtures match the closed forms") {
    val Seq(a, b, c) = runGq(Seq(
      "aa bbb cccc",                     // 3 words, 9 chars
      "a # b ... c ....",                // 1 hash, 2 ellipses, 6 words
      "- item one\n* item two\n• dot\nplain end..."))
    assert(a.words === 3L && a.meanLen === 3.0 && a.alphaFrac === 1.0)
    assert(b.hashFrac === 1.0 / 6 && b.ellFrac === 2.0 / 6)
    assert(c.bulletFrac === 3.0 / 4 && c.ellLineFrac === 1.0 / 4)
  }

  test("gopher quality: stopwords, keep rule, and empty text") {
    val pass = (("the of " * 1) + ("alpha beta gamma delta " * 12)).trim
    val Seq(p, few) = runGq(Seq(pass, "the of tiny."))
    assert(p.words === 50L && p.stopwords === 2L && p.keep)
    assert(few.words === 3L && !few.keep) // under the 50-word floor
    val Seq(e) = runGq(Seq(""))
    assert(e.words === 1L && e.meanLen === 0.0 && !e.keep)
  }

  test("both batteries match the reference on seeded generated docs") {
    val rnd = new scala.util.Random(42)
    val vocab = Seq("the", "of", "and", "data", "spark", "x1", "##",
      "...", "a", "-", "lorem", "ipsum", "{", "badword", "JavaScript",
      "line.", "go!", "why?", "said\"")
    val docs = (0 until 120).map { _ =>
      val n = 1 + rnd.nextInt(80)
      (0 until n).map { _ =>
        val w = vocab(rnd.nextInt(vocab.length))
        if (rnd.nextInt(12) == 0) w + "\n" else w
      }.mkString(" ")
    }
    assert(runC4(docs) === docs.map(c4Ref))
    assert(runGq(docs) === docs.map(gqRef))
  }

  test("SQL surface: both functions are injected and registered") {
    val r1 = spark.sql(
      "SELECT graft_c4_stats('a b c.\nd e f.') AS s").select("s.n_kept")
      .collect().head.getInt(0)
    assert(r1 === 2)
    val r2 = spark.sql(
      "SELECT graft_gopher_quality('aa bbb cccc') AS s")
      .select("s.mean_word_len").collect().head.getDouble(0)
    assert(r2 === 3.0)
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT graft_c4_stats('x y z!') AS s")
      .select("s.n_sentences").collect().head.getInt(0) === 1)
  }
}
