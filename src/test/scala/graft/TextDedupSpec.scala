package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

class TextDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 1
    (3L, "completely different content about spark engines"),
    (4L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (5L, "THE  Quick   brown fox jumps over the lazy dog") // fingerprint-dup of 1 (case+ws)
  ).toDF("doc_id", "text")

  test("fleschScore: hand-computed counts; empty and null text are NULL") {
    import spark.implicits._
    // "The cat sat. It ran!" -> words 5, sentences 2,
    // vowel groups: e,a,a,I,a = 5 -> 206.835 - 1.015*2.5 - 84.6*1.0
    val out = Seq((1L, "The cat sat. It ran!"), (2L, ""), (3L, null),
      (4L, "zzz pfft"))
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.fleschScore(col("text")).as("f"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L) === Some(206.835 - 1.015 * 2.5 - 84.6 * 1.0))
    assert(out(2L) === None && out(3L) === None)
    // no vowels: syllables 0, sentences floor to 1
    assert(out(4L) === Some(206.835 - 1.015 * 2.0 - 84.6 * 0.0))
  }

  test("lshTuningCurve: monotone S-curve with closed-form endpoints " +
      "and the (1/b)^(1/r) threshold crossing") {
    val c = Dedup.lshTuningCurve(spark, bands = 16, rows = 8)
      .orderBy("s").select("s", "p_candidate")
      .as[(Double, Double)].collect()
    assert(c.length === 19)
    assert(c.map(_._2).sliding(2).forall(p => p(0) <= p(1)),
      "candidate probability must be monotone in similarity")
    def ref(s: Double) = BigDecimal(
      1.0 - math.pow(1.0 - math.pow(s, 8.0), 16.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    c.foreach { case (s, p) => assert(p === ref(s), s"s=$s") }
    // the 50% crossing sits near (1/16)^(1/8) ~ 0.69: first grid
    // point at or past it is 14/20
    val cross = c.filter(_._2 >= 0.5).map(_._1).min
    assert(cross === 14.0 / 20.0, "first grid point past the crossing")
    assertThrows[IllegalArgumentException] {
      Dedup.lshTuningCurve(spark, bands = 0, rows = 8)
    }
  }

  test("scriptMix: per-token script presence and intra-token mixing") {
    import spark.implicits._
    val out = Seq(
      (1L, "hello мир 世界 payмent αβ"),
      (2L, "plain ascii only."),
      (3L, ""))
      .toDF("doc_id", "text")
    val r = TextAnalysis.scriptMix(out, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        (1 to 6).map(x.getLong).toSeq).toMap
    // doc 1: 5 tokens; latin in {hello, payмent}, cyrillic in
    // {мир, payмent}, cjk in {世界}, greek in {αβ}; payмent mixes two
    assert(r(1L) === Seq(5L, 2L, 2L, 1L, 1L, 1L))
    assert(r(2L) === Seq(3L, 3L, 0L, 0L, 0L, 0L))
    assert(r(3L) === Seq(0L, 0L, 0L, 0L, 0L, 0L))
  }

  test("exact dedup keeps lowest id per identical text") {
    val surv = Dedup.exactSurvivors(docs, col("text"), col("doc_id"))
      .orderBy("survivor_id").as[Long].collect()
    assert(surv === Array(1L, 2L, 3L, 5L))
  }

  test("fingerprint dedup also collapses case/whitespace variants") {
    val kept = Dedup.byFingerprint(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(1L, 2L, 3L))
  }

  test("fingerprint is invariant to case and whitespace runs") {
    val fps = docs.select(TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(_.getString(0))
    assert(fps(0) === fps(3))
    assert(fps(0) === fps(4))
    assert(fps(0) !== fps(2))
  }

  test("minhash LSH finds near-dup and exact-dup pairs") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      n = 2, numHashes = 64, bands = 16, threshold = 0.5)
      .select("doc_id", "doc_id_2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // exact dup, jaccard 1.0
    assert(pairs.contains((1L, 2L))) // near dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical texts distance 0; unrelated texts far") {
    val sigs = docs.select(col("doc_id"),
      Dedup.simhash64(TextAnalysis.tokens(col("text"))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) === sigs(4L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) > 10)
  }

  test("simhashPairs returns exact dups at distance 0") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3)
      .select("doc_id", "doc_id_2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("minhash recall: every planted near-dup pair (sim>=0.9) is found") {
    import org.apache.spark.sql.functions._
    // 60 base docs of 40 distinct-ish tokens; each gets a copy with the
    // last 2 tokens changed => shingle jaccard ~0.9
    val rnd = new scala.util.Random(13)
    val vocab = Vector.tabulate(200)(i => s"w$i")
    val rows = (0 until 60).flatMap { i =>
      val toks = Vector.fill(40)(vocab(rnd.nextInt(vocab.size)))
      val near = toks.dropRight(2) ++ Vector("zz1", "zz2")
      Seq((i.toLong, toks.mkString(" ")), (i + 1000L, near.mkString(" ")))
    }
    val df = rows.toDF("doc_id", "text")
    val found = Dedup.minhashPairs(df, "doc_id", "text",
      n = 3, numHashes = 128, bands = 16, threshold = 0.5)
      .select("doc_id", "doc_id_2").as[(Long, Long)].collect().toSet
    val missing = (0 until 60).map(i => (i.toLong, i + 1000L))
      .filterNot(found.contains)
    assert(missing.isEmpty, s"planted pairs missed: $missing")
  }

  test("bucket cap: linear chain pairs still connect a boilerplate cluster") {
    // 30 identical docs (one giant LSH bucket) plus one unrelated doc.
    val rows = (0 until 30).map(i =>
      (i.toLong, "exact same boilerplate text repeated in every document here")) :+
      (100L, "totally unrelated content about something else entirely")
    val df = rows.toDF("doc_id", "text")
    val capped = Dedup.minhashPairs(df, "doc_id", "text",
      n = 2, numHashes = 64, bands = 16, threshold = 0.5, maxBucketSize = 5)
      .select("doc_id", "doc_id_2").as[(Long, Long)].collect().toSet
    // linear, not quadratic: 29 chain pairs, not 30*29/2 = 435
    assert(capped === (0 until 29).map(i => (i.toLong, i + 1L)).toSet)
    // transitive connectivity: union-find over pairs yields ONE cluster
    val parent = scala.collection.mutable.Map((0 until 30).map(i => i.toLong -> i.toLong): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    capped.foreach { case (a, b) => parent(find(a)) = find(b) }
    assert((0 until 30).map(i => find(i.toLong)).toSet.size === 1)
    // uncapped default on the same input is the full quadratic set
    val full = Dedup.minhashPairs(df, "doc_id", "text",
      n = 2, numHashes = 64, bands = 16, threshold = 0.5)
      .select("doc_id", "doc_id_2").as[(Long, Long)].collect().toSet
    assert(full.size === 435)
  }

  test("blockedJaccardPairs: oversized block emits O(B·k) candidates, not B²") {
    // one (lang) block of B=3000 docs: an uncapped self-join would build
    // ~4.5M pairs in one task; the sorted-neighborhood fallback must emit
    // exactly B·k - k(k+1)/2 (each rank pairs with its next k successors)
    val B = 3000
    val k = 4
    val corpus = spark.range(B).select(
      col("id").as("doc_id"),
      // ~30 distinct char-set classes so similar docs exist to find
      concat(lit("doc text variant "), (col("id") % 30).cast("string"))
        .as("text"),
      lit("en").as("lang"))
    val pairs = Dedup.blockedJaccardPairs(corpus, "doc_id", "text",
      Seq("lang"), threshold = 0.0, maxBlockSize = 100, neighborhood = k)
    val n = pairs.count()
    assert(n === B.toLong * k - k * (k + 1) / 2, // 11990, not ~4.5M
      s"expected O(B·k) sorted-neighborhood candidates, got $n")
    // recall inside the window: identical char-set docs sort adjacently,
    // so sim=1.0 pairs survive the cap
    assert(pairs.where(col("sim") === 1.0).count() > 0)
    // below the cap the pairing stays exhaustive-exact: same corpus, cap
    // not triggered → full B² filtering (sanity: strictly more pairs)
    val exhaustive = Dedup.blockedJaccardPairs(corpus.limit(200), "doc_id",
      "text", Seq("lang"), threshold = 0.0)
    assert(exhaustive.count() === 200L * 199 / 2)
  }

  test("SNM two-level rank is prefix-length invariant (== single-window order)") {
    // The distributed SNM rank buckets by a PREFIX of the sort key, so
    // any prefix length must yield the same global order — prefixLen 1
    // (few big buckets), 4 (default), and 64 (≈ one bucket per distinct
    // key) must emit the identical pair set with identical sims.
    val corpus = spark.range(1200).select(
      col("id").as("doc_id"),
      concat(lit("skewed body "), (col("id") % 17).cast("string"),
        lit(" tail "), (col("id") % 5).cast("string")).as("text"),
      lit("en").as("lang"))
    def pairs(p: Int) = Dedup.blockedJaccardPairs(corpus, "doc_id", "text",
      Seq("lang"), threshold = 0.0, maxBlockSize = 100, neighborhood = 3,
      snmPrefixLen = p)
      .select("doc_id", "doc_id_2", "sim")
      .as[(Long, Long, Double)].collect().toSet
    val p1 = pairs(1)
    assert(p1 === pairs(4))
    assert(p1 === pairs(64))
    assert(p1.size === 1200 * 3 - 3 * 4 / 2) // still exactly B·k - k(k+1)/2
  }

  test("sortedNeighborhoodPairs: planted adjacent near-dups found, " +
      "candidate count linear, prefix-length invariant") {
    // 300 distinct docs + 30 planted near-dup twins whose normalized
    // prefix equals their original's → twins sort adjacent → found.
    val base = spark.range(300).select(
      col("id").as("doc_id"),
      concat(lit("document body number "), col("id").cast("string"),
        lit(" with shared filler words in the middle section"))
        .as("text"))
    val twins = spark.range(30).select(
      (col("id") + 10000L).as("doc_id"),
      concat(lit("document body number "), (col("id") * 10).cast("string"),
        lit(" with shared filler words in the middle"))
        .as("text")) // drops 2 tokens → high-Jaccard near-dup of id*10
    val corpus = base.unionByName(twins)
    val key = substring(
      regexp_replace(lower(col("text")), "[^a-z0-9]", ""), 1, 30)
    def run(p: Int) = Dedup.sortedNeighborhoodPairs(corpus, "doc_id",
      "text", key, window = 6, threshold = 0.5, prefixLen = p)
      .select("doc_id", "doc_id_2", "sim")
      .as[(Long, Long, Double)].collect().toSet
    val got = run(4)
    // every planted twin pairs with its original
    (0L until 30L).foreach { i =>
      assert(got.exists { case (a, b, _) => a == i * 10 && b == 10000 + i },
        s"missing planted pair for original ${i * 10}")
    }
    // two-level rank invariance: bucket granularity cannot change output
    assert(got === run(1))
    assert(got === run(64))
    // linear candidate bound: at most N·(window-1) verified pairs
    assert(got.size <= 330 * 5)
  }

  test("blockedShinglePairs (the registered d2 path): oversized block " +
      "falls back to O(B·k); below the cap it IS the exhaustive form") {
    // one (lang, source) block of B=3000 docs — an uncapped all-pairs
    // candidate step would build ~4.5M pairs in one task; the operator
    // the d2 query registers must emit exactly B·k - k(k+1)/2
    val B = 3000
    val k = 4
    val corpus = spark.range(B).select(
      col("id").as("doc_id"),
      concat(lit("alpha beta gamma variant "), (col("id") % 30).cast("string"))
        .as("text"),
      lit("en").as("lang"), lit("s1").as("source"))
    val capped = Dedup.blockedShinglePairs(corpus, "doc_id", "text",
      Seq("lang", "source"), threshold = 0.0, maxBlockSize = 100,
      neighborhood = k)
    assert(capped.count() === B.toLong * k - k * (k + 1) / 2)
    // identical-text docs sort adjacently under the normalized-prefix
    // key, so sim=1.0 pairs survive the cap
    assert(capped.where(col("sim") === 1.0).count() > 0)
    // below the cap the operator equals the uncapped exhaustive form
    // pair-for-pair, sims included — which is why routing d2 through it
    // leaves the oracle hash unchanged at test scale
    val sub = corpus.limit(200)
    def all(cap: Int) = Dedup.blockedShinglePairs(sub, "doc_id", "text",
      Seq("lang", "source"), threshold = 0.3, maxBlockSize = cap)
      .select("doc_id", "doc_id_2", "sim")
      .as[(Long, Long, Double)].collect().toSet
    assert(all(2048) === all(Int.MaxValue))
    // and the capped candidate set is always a subset of exhaustive
    def ids(cap: Int) = Dedup.blockedShinglePairs(corpus, "doc_id", "text",
      Seq("lang", "source"), threshold = 0.3, maxBlockSize = cap)
      .select("doc_id", "doc_id_2").as[(Long, Long)].collect().toSet
    val snm = ids(100)
    assert(snm.nonEmpty && snm.subsetOf(ids(Int.MaxValue)))
  }

  test("containment pairs: token-prefix subset scores exactly 1.0 where " +
      "Jaccard drops; overlap denominator is the smaller set") {
    val host = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (1L, host, "en", "s"),
      // token prefix of 1 — shingle set is a strict subset
      (2L, "alpha beta gamma delta epsilon", "en", "s"),
      (3L, "unrelated words entirely different content here now", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val pairs = Dedup.blockedContainmentPairs(corpus, "doc_id", "text",
      Seq("lang", "source"), threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(pairs === Set((1L, 2L, 1.0)))
    // sanity: the same pair under Jaccard is 3/8 (3 shared of 8 + 3 - 3
    // distinct shingles) — structurally below any useful threshold
    val j = Dedup.blockedShinglePairs(corpus, "doc_id", "text",
      Seq("lang", "source"), threshold = 0.0)
      .where(col("doc_id") === 1L && col("doc_id_2") === 2L)
      .select("sim").as[Double].head()
    assert(math.abs(j - 3.0 / 8.0) < 1e-12)
    // asymmetry folds: overlap(a,b) == overlap(b,a) == max containment
    val ov = graft.functions.GraftFunctions.overlap _
    val row = Seq((Array(1L, 2L, 3L), Array(2L, 3L, 4L, 5L)))
      .toDF("a", "b")
      .select(ov(col("a"), col("b")).as("ab"), ov(col("b"), col("a")).as("ba"),
        ov(col("a"), typedLit(Array.empty[Long])).as("ae"))
      .as[(Double, Double, Double)].head()
    assert(row._1 === 2.0 / 3.0 && row._2 === 2.0 / 3.0 && row._3 === 0.0)
  }

  test("capped blockedJaccardPairs emits only pairs the exhaustive form emits") {
    val corpus = spark.range(300).select(
      col("id").as("doc_id"),
      concat(lit("text body variant "), (col("id") % 12).cast("string"))
        .as("text"),
      lit("en").as("lang"))
    def pairs(cap: Int) = Dedup.blockedJaccardPairs(corpus, "doc_id", "text",
      Seq("lang"), threshold = 0.3, maxBlockSize = cap)
      .select("doc_id", "doc_id_2").as[(Long, Long)].collect().toSet
    val exhaustive = pairs(Int.MaxValue)
    val capped = pairs(50)
    assert(capped.nonEmpty && capped.subsetOf(exhaustive),
      "SNM candidates must be real pairs, never fabricated ones")
  }

  test("connected components: chains, cliques, singletons, canonicalize") {
    // path 1-2-3-4-5 (diameter 4 forces multiple propagation rounds),
    // clique-ish 10-11/11-12/10-12, isolated 99
    val vertices = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L, 99L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("id", "id_2")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 99L -> 99L)
    // driver union-find path (default threshold)
    val comps = Dedup.connectedComponents(vertices, pairs, "id", "id_2")
      .as[(Long, Long)].collect().toMap
    assert(comps === want)
    // distributed propagation path (forced): same fixpoint
    val dist = Dedup.connectedComponents(vertices, pairs, "id", "id_2",
      localEdgeThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(dist === want)
    // survivor selection keeps the min id per component
    val rows = vertices.withColumn("payload", col("id") * 2)
    val kept = Dedup.canonicalize(rows, pairs, "id", "id_2")
      .select("id").as[Long].collect().sorted
    assert(kept === Array(1L, 10L, 99L))
  }

  test("components property: random graphs match a local reference") {
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 3) {
      val n = 30 + trial * 10
      val vertexIds = (0L until n.toLong)
      val edges = Seq.fill(n / 2)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      // local union-find reference (min-root)
      val parent = scala.collection.mutable.Map(vertexIds.map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val want = vertexIds.map(i => i -> find(i)).toMap
      val vDf = vertexIds.toDF("id")
      val eDf = edges.toDF("id", "id_2")
      for (threshold <- Seq(1000000L, 0L)) { // driver path and distributed path
        val got = Dedup.connectedComponents(vDf, eDf, "id", "id_2",
          localEdgeThreshold = threshold)
          .as[(Long, Long)].collect().toMap
        assert(got === want, s"trial=$trial threshold=$threshold")
      }
      val star = Dedup.componentsViaStarContraction(vDf, eDf, "id", "id_2")
        .as[(Long, Long)].collect().toMap
      assert(star === want, s"trial=$trial star-contraction")
    }
  }

  test("star contraction handles a long path graph in few rounds") {
    // a 60-vertex path: diameter 59 — propagation worst case, log-round
    // territory for large-star/small-star
    val n = 60
    val vDf = (0L until n.toLong).toDF("id")
    val eDf = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("id", "id_2")
    val got = Dedup.componentsViaStarContraction(vDf, eDf, "id", "id_2",
      maxIter = 12) // << diameter: must converge in O(log n) rounds
    assert(got.as[(Long, Long)].collect().toMap ===
      (0L until n.toLong).map(_ -> 0L).toMap)
  }

  test("langId picks marker-matching language, und on no markers") {
    val df = Seq(
      "the cat is a friend of the dog",
      "el perro de la casa que ladra y muerde",
      "der hund und die katze das ist gut",
      "zzz qqq xxx").toDF("text")
    val got = df.select(TextAnalysis.langId(col("text"))).as[String].collect()
    assert(got === Array("en", "es", "de", "und"))
  }

  test("token and subword counts") {
    val df = Seq("hello world, 42 times!").toDF("text")
    val r = df.select(
      TextAnalysis.tokenCount(col("text")),
      TextAnalysis.subwordCount(col("text"))).head
    assert(r.getInt(0) === 4)
    // hello | world | , | 42 | times | ! = 6
    assert(r.getInt(1) === 6)
  }

  test("repetition stats: hand-computed fractions") {
    val df = Seq(
      (1L, "aa\nbb\naa\ncc\naa"), // 5 lines, 3 distinct; dup chars 4/10
      (2L, "x y x y x y"),        // bigrams: "x y"x3 "y x"x2 -> 3/5
      (3L, "unique line\nother"), // no line dups; 2 bigrams, top 1/2
      (4L, "")                    // degenerate: zeros, no NaN
    ).toDF("doc_id", "text")
    val r = df.select(col("doc_id"),
        graft.functions.GraftFunctions.repetitionStats(col("text")).as("rep"))
      .orderBy("doc_id")
      .select("rep.dup_line_frac", "rep.dup_line_char_frac",
        "rep.top_bigram_frac")
      .as[(Double, Double, Double)].collect()
    assert(r(0) === ((0.4, 0.4, 0.25))) // 4 distinct bigrams of 4 total
    assert(r(1) === ((0.0, 0.0, 0.6)))
    assert(r(2) === ((0.0, 0.0, 0.5)))
    assert(r(3) === ((0.0, 0.0, 0.0)))
  }

  test("incremental dedup: corpus dups, in-batch dups, nulls") {
    val corpus = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val corpusFps = corpus.select(
      TextAnalysis.fingerprint(col("text")).as("fp"))
    val batch = Seq(
      (10L, "alpha"),      // dup of corpus -> dropped
      (11L, "gamma"),      // fresh, survivor
      (12L, "GAMMA "),     // fingerprint-dup of 11 -> dropped (keep min)
      (13L, null: String), // null text survives the anti join...
      (14L, null: String)  // ...and nulls collapse to one survivor
    ).toDF("doc_id", "text")
    val got = Dedup.incremental(batch, "text", "doc_id", corpusFps, "fp")
      .select("doc_id").as[Long].collect().sorted
    assert(got === Array(11L, 13L))
  }

  test("bloom incremental == exact incremental even under heavy FPs") {
    val corpus = (0L until 200L).map(i => (i, s"corpus doc $i"))
      .toDF("doc_id", "text")
    val corpusFps = corpus.select(
      TextAnalysis.fingerprint(col("text")).as("fp"))
    val batch = ((1000L until 1100L).map(i => (i, s"fresh doc $i")) ++
      Seq((2000L, "corpus doc 7"),     // corpus dup
          (2001L, "fresh doc 1000"),   // in-batch dup
          (2002L, null: String)))
      .toDF("doc_id", "text")
    val want = Dedup.incremental(batch, "text", "doc_id", corpusFps, "fp")
      .select("doc_id").as[Long].collect().sorted
    // expectedItems far below reality + high fpp -> saturated bloom,
    // lots of false positives; output must not change
    val got = Dedup.incrementalBloom(batch, "text", "doc_id",
        corpusFps, "fp", expectedItems = 8L, fpp = 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(got === want)
    assert(want.length === 101) // 100 fresh + the null survivor
  }

  test("repetition stats: null text yields null struct") {
    val df = Seq((1L, null: String)).toDF("doc_id", "text")
    val r = df.select(
      graft.functions.GraftFunctions.repetitionStats(col("text"))).head
    assert(r.isNullAt(0))
  }

  test("dedupLines removes corpus-frequent lines, keeps original order") {
    val docs = Seq(
      (1L, "unique alpha\nSubscribe now!\nunique beta"),
      (2L, "subscribe NOW!\nonly here"),          // case-variant counts too
      (3L, "  Subscribe now!  \nanother body"),   // trim-variant counts too
      (4L, "Subscribe now!")                      // nothing left -> dropped
    ).toDF("doc_id", "text")
    val got = TextAnalysis.dedupLines(docs, "doc_id", "text", minCount = 3)
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(got === Array(
      1L -> "unique alpha\nunique beta",          // middle line removed, order kept
      2L -> "only here",
      3L -> "another body"))                      // doc 4 dropped entirely
    // keepEmpty retains the emptied doc with "" text
    val kept = TextAnalysis.dedupLines(docs, "doc_id", "text",
        minCount = 3, keepEmpty = true)
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(kept.length === 4 && kept(3) === (4L -> ""))
  }

  test("dedupLines minCount boundary: frequency == minCount is removed") {
    val docs = Seq(
      (1L, "twice\na1"), (2L, "twice\na2"), (3L, "solo\na3")
    ).toDF("doc_id", "text")
    // "twice" appears exactly 2x: removed at minCount=2, kept at minCount=3
    val at2 = TextAnalysis.dedupLines(docs, "doc_id", "text", minCount = 2)
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(at2 === Array(1L -> "a1", 2L -> "a2", 3L -> "solo\na3"))
    val at3 = TextAnalysis.dedupLines(docs, "doc_id", "text", minCount = 3)
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(at3 === Array(
      1L -> "twice\na1", 2L -> "twice\na2", 3L -> "solo\na3"))
  }

  test("trigram-LM perplexity: in-distribution text scores lower than " +
      "junk, OOV takes the floor, short docs drop") {
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ran to the mat"),
      (3L, "the rat sat on the cat"),
      (4L, "zq!7#xv 9@kp"), // junk: trigrams seen only here
      (5L, "ab")            // under 3 chars: no trigrams
    ).toDF("doc_id", "text")
    val lm = TextAnalysis.trigramLM(corpus, "text")
    val got = TextAnalysis.perplexity(corpus, "doc_id", "text", lm)
      .orderBy("doc_id")
      .select($"doc_id", $"ppl").as[(Long, Double)].collect().toMap
    assert(!got.contains(5L), "sub-trigram docs have nothing to score")
    // docs built from shared trigrams sit well below the junk doc
    assert(Seq(1L, 2L, 3L).forall(d => got(d) < got(4L)),
      s"in-distribution docs must beat junk: $got")
    // an unseen doc scored against the same LM: OOV floor dominates
    val oov = TextAnalysis.perplexity(
      Seq((9L, "wholly unseen trigram material qqq")).toDF("doc_id", "text"),
      "doc_id", "text", lm)
      .select($"ppl").as[Double].head()
    assert(oov > got(4L), "OOV-heavy text must score worst of all")
    // determinism under repartitioning (decimal-stabilized mean)
    val again = TextAnalysis.perplexity(corpus.repartition(7), "doc_id",
      "text", lm).orderBy("doc_id")
      .select($"doc_id", $"ppl").as[(Long, Double)].collect().toMap
    assert(again === got)
  }

  test("stripBoilerplate: lines in >= minDocFreq docs vanish " +
    "everywhere, order preserved, empty lines never count as evidence") {
    val corpus = Seq(
      (1L, "alpha\nBANNER\nbody one\n\nBANNER"),
      (2L, "BANNER\nbody two"),
      (3L, "body three\nBANNER\nrare pair"),
      (4L, "rare pair\nonly here"),
      (5L, "\n\n")) // blank-only doc: blanks are kept, never boilerplate
      .toDF("doc_id", "text")
    val out = TextAnalysis.stripBoilerplate(corpus, "doc_id", "text",
      minDocFreq = 3)
      .orderBy("doc_id")
      .select("clean_text", "n_lines_kept", "n_lines_dropped")
      .as[(String, Long, Long)].collect()
    // BANNER (3 docs) dropped; "rare pair" (2 docs) kept
    assert(out(0) === (("alpha\nbody one\n", 3L, 2L)))
    assert(out(1) === (("body two", 1L, 1L)))
    assert(out(2) === (("body three\nrare pair", 2L, 1L)))
    assert(out(3) === (("rare pair\nonly here", 2L, 0L)))
    assert(out(4) === (("\n\n", 3L, 0L)))
  }

  test("best-of-cluster: the survivor is the highest-quality member, " +
    "not the lowest id (d14's policy vs d1/d5's min-id convention)") {
    // doc 1 is a low-quality truncation of doc 2; near-dup pairing puts
    // them in one component; the survivor must be 2 (higher quality)
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy", "en", "web"),
      (2L, "the quick brown fox jumps over the lazy dog. " +
        "a full sentence of the corpus, and it is longer and cleaner.",
        "en", "web"),
      (3L, "unrelated text entirely about something else here",
        "en", "web")).toDF("doc_id", "text", "lang", "source")
    val pairs = Dedup.blockedShinglePairs(corpus, "doc_id", "text",
      Seq("lang", "source"), threshold = 0.3)
      .select(col("doc_id"), col("doc_id_2"))
    val comp = Dedup.connectedComponents(
      corpus.select(col("doc_id")), pairs, "doc_id", "doc_id_2")
    val q = corpus.select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
    val best = comp.join(q, "doc_id")
      .groupBy(col("component"))
      .agg(max(struct(col("quality"), (-col("doc_id")).as("n"))).as("b"))
      .select(col("component"), (-col("b.n")).as("survivor_id"))
      .orderBy("component")
      .as[(Long, Long)].collect()
    assert(best.length === 2)
    assert(best(0) === ((1L, 2L))) // cluster {1,2} survived by 2
    assert(best(1) === ((3L, 3L)))
  }

  test("stripBoilerplate: a doc that is ALL boilerplate survives with " +
    "empty text and full drop count") {
    val corpus = Seq(
      (1L, "B1\nB2"), (2L, "B1\nB2"), (3L, "B1\nB2\nunique")) // df = 3
      .toDF("doc_id", "text")
    val out = TextAnalysis.stripBoilerplate(corpus, "doc_id", "text",
      minDocFreq = 3)
      .orderBy("doc_id")
      .select("clean_text", "n_lines_kept", "n_lines_dropped")
      .as[(String, Long, Long)].collect()
    assert(out(0) === (("", 0L, 2L)))
    assert(out(1) === (("", 0L, 2L)))
    assert(out(2) === (("unique", 1L, 2L)))
  }
  test("hammingPairs64: pigeonhole blocking finds all pairs to dist 3, " +
      "none beyond; halves both count") {
    // a=base; b = a with 1 bit flipped in hi; c = a with 2 bits in lo;
    // d = a with 3 bits split across halves; e = a with 4 bits (missed
    // by the <=3 verify even though blocking may candidate it)
    val a = (0x0F0F0F0FL, 0x00FF00FFL)
    val rows = Seq(
      (1L, a._1, a._2),
      (2L, a._1 ^ 1L, a._2),                  // dist 1
      (3L, a._1, a._2 ^ 3L),                   // dist 2
      (4L, a._1 ^ (1L << 20), a._2 ^ 3L),      // dist 3
      (5L, a._1 ^ (3L << 20), a._2 ^ 3L))      // dist 4
      .toDF("id", "hi", "lo")
    val got = Dedup.hammingPairs64(rows, "id", "hi", "lo", maxDist = 3)
      .orderBy("id", "id_2")
      .select("id", "id_2", "dist").as[(Long, Long, Int)].collect()
    val exp = Seq((1L,2L,1),(1L,3L,2),(1L,4L,3),(2L,3L,3),(3L,4L,1),
      (3L,5L,2),(4L,5L,1))
    // every expected pair present with the right distance; no pair
    // beyond dist 3 (e.g. (1,5) at dist 4, (2,4) at dist 4)
    assert(got.toSet === exp.toSet)
  }

  test("hammingPairs64: oversized buckets go second-level, recall " +
      "stays exact to dist 3 (adversarial shared-chunk corpus)") {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    // 400 signatures ALL sharing chunk 0 (= hi & 0xFFFF): one
    // first-level bucket of 400+ rows — the exact skew the cap guards
    val base = (0 until 400).map { i =>
      ((i + 1).toLong,
        (mix(i.toLong) & 0xFFFF0000L) | 0x1234L,
        mix(i * 7919L + 1) & 0xFFFFFFFFL)
    }
    val planted = Seq(
      // dist 1 / 2: also found via small chunk-2/3 buckets
      (1000L, base(10)._2 ^ (1L << 20), base(10)._3),
      (1001L, base(20)._2, base(20)._3 ^ (3L << 5)),
      // dist 3 SPREAD over chunks 1, 2, 3 — chunk 0 is the ONLY clean
      // chunk, so this pair is reachable only through the oversized
      // bucket's second level
      (1002L, base(30)._2 ^ (1L << 20), base(30)._3 ^ (1L << 5)
        ^ (1L << 20)),
      // dist 4: must be verified away
      (1003L, base(40)._2 ^ (3L << 25), base(40)._3 ^ (3L << 9)))
    val all = base ++ planted
    def ham(a: (Long, Long), b: (Long, Long)) =
      java.lang.Long.bitCount(a._1 ^ b._1) +
        java.lang.Long.bitCount(a._2 ^ b._2)
    val expected = (for {
      x <- all; y <- all if x._1 < y._1
      d = ham((x._2, x._3), (y._2, y._3)) if d <= 3
    } yield (x._1, y._1, d)).toSet
    assert(expected.exists(_._3 === 3), "spread dist-3 pair planted")
    // cap 50 << 404 forces the second level for the shared bucket
    val got = Dedup.hammingPairs64(all.toDF("id", "hi", "lo"),
      "id", "hi", "lo", maxDist = 3, maxBucketSize = 50)
      .select("id", "id_2", "dist").as[(Long, Long, Int)]
      .collect().toSet
    assert(got === expected)
    // layout invariance
    val got7 = Dedup.hammingPairs64(
      all.toDF("id", "hi", "lo").repartition(7),
      "id", "hi", "lo", maxDist = 3, maxBucketSize = 50).count()
    assert(got7 === expected.size.toLong)
  }
}
