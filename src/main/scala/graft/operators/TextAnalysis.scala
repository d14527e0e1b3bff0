package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines
  * (north-star extensions beyond the reference surface — BASELINE.json).
  *
  * All operators are pure column expressions (no UDFs): language ID,
  * quality scoring, token counting, and fingerprinting run map-side with
  * zero shuffles, so at 100 TB they cost exactly one scan.
  */
object TextAnalysis {

  /** Whitespace tokenization. `trim` strips leading/trailing ASCII
    * spaces (only — leading tabs/newlines still yield one empty first
    * token, and an empty string tokenizes to [""]; DuckDB's trim +
    * string_split_regex behave identically, which the oracle parity
    * relies on — do not "fix" one side alone).
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * non-alphanumeric glyphs — the shape of a byte-pair tokenizer's
    * pre-tokenization. Cheap proxy for LLM token budgeting.
    */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Punctuation character count (explicit class — engine-portable). */
  def punctCount(text: Column): Column =
    regexp_count(text, lit("[.,;:!?'\"()-]"))

  // Per-language marker stopwords for the n-gram language heuristic.
  // Tiny on purpose: the heuristic is argmax of marker-token hits.
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  /** Count of tokens that appear in `words` (exact token match). */
  def markerHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => words.map(w => t === lit(w)).reduce(_ || _)))

  /** Heuristic language ID: argmax of per-language marker hits, "und"
    * when nothing matches. Ties break by [[langMarkers]] order (en first
    * — array_position returns the FIRST index of the max). Built as one
    * score array + array_max/array_position so each per-language
    * markerHits (a tokenize+filter pass) is evaluated ~2× per row; the
    * earlier when-chain over per-branch greatest() re-evaluated them ~7×
    * each (HOFs are CodegenFallback — no CSE rescues interpreted trees).
    */
  def langId(text: Column): Column = {
    val scores = array(langMarkers.map { case (_, ws) => markerHits(text, ws) }: _*)
    val names = array(langMarkers.map(l => lit(l._1)): _*)
    val best = array_max(scores)
    when(best > 0,
      element_at(names, array_position(scores, best).cast(IntegerType)))
      .otherwise(lit("und"))
  }

  /** Stopword ratio against English markers (quality signal). */
  def stopwordRatio(text: Column): Column =
    markerHits(text, langMarkers.head._2).cast(DoubleType) /
      greatest(tokenCount(text), lit(1)).cast(DoubleType)

  /** Composite quality score in [0,1]: length band + punctuation sanity +
    * stopword presence. Deterministic double arithmetic (same expression
    * tree evaluates identically everywhere).
    */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast(DoubleType)
    val lenScore = least(len / lit(400.0), lit(1.0))
    val punctRatio = punctCount(text).cast(DoubleType) / greatest(len, lit(1.0))
    val punctScore = when(punctRatio > 0.2, lit(0.0)).otherwise(lit(1.0) - punctRatio * 5)
    val stopScore = least(stopwordRatio(text) * lit(5.0), lit(1.0))
    round(lenScore * 0.4 + punctScore * 0.3 + stopScore * 0.3, 6)
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text.
    * Content-defined, join-friendly (32 hex chars), portable across
    * engines — the exact-dedup key for [[Dedup.byFingerprint]].
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Rolling polynomial hash over tokens (base-31 mod 2^64, Java-string
    * style but over whole tokens) — an order-sensitive fingerprint that,
    * unlike [[fingerprint]], can be computed incrementally per shingle.
    * Used as the shingle hash for MinHash.
    */
  def rollingTokenHash(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, t) => acc * lit(1315423911L) + xxhash64(t))

  /** Top-k TF-IDF terms per document. tf = term count in doc; idf =
    * ln((N+1)/(df+1)) (smoothed); ties broken by term ascending. Shape at
    * scale: explode (map-side) → two narrow groupBys (doc,term) and
    * (term) — both partial-aggregated — a 1-row N broadcast-joined in,
    * then a per-doc top-k window. No full-corpus collect anywhere; the
    * double math is one fixed expression tree (engine-portable).
    */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val terms = df.select(col(idCol),
      explode(tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast(DoubleType).as("tf"))
    // tf already has one row per (doc, term): df is a reaggregation of it,
    // not a second explode+distinct pass over the corpus
    val dfreq = tf.groupBy("term")
      .agg(count(lit(1)).cast(DoubleType).as("df"))
    val n = df.agg(count(lit(1)).cast(DoubleType).as("__n"))
    // ln() differs in the last ulp across libm implementations; round to
    // 6 dp so the OUTPUT is engine-portable. Ranking still uses the raw
    // value — scores from different (tf, df) pairs differ far beyond one
    // ulp, and equal pairs are exactly equal (tie-broken by term).
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf") * log((col("__n") + 1) / (col("df") + 1)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(desc("tfidf"), col("term"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col(idCol), col("term"), round(col("tfidf"), 6).as("tfidf"),
        col("rk").cast(IntegerType).as("rk"))
  }

  /** Distributed BPE merge-table training (Sennrich et al.): the corpus
    * tokenizes ONCE into a distinct-word frequency frame (Heaps' law —
    * vastly smaller than the corpus and the only thing the iterations
    * touch); each merge round re-encodes that frame map-side with the
    * merges learned so far (`GraftFunctions.BpeEncode` — constant
    * lineage depth, no checkpointing), counts adjacent symbol pairs
    * weighted by word frequency through one narrow shuffle, and takes
    * the top pair (count desc, then lexicographic — deterministic,
    * where reference implementations tie-break by dict order). Stops
    * early when the best pair's count drops below `minPairCount`.
    * The per-round collect is ONE row.
    *
    * Scale shape: numMerges small jobs over the word frame; the corpus
    * itself is scanned exactly once. A 100 TB corpus's distinct-word
    * frame is ~billions of rows at worst — each round is a map-side
    * encode + a (pair → count) partial-agg shuffle, all parallel.
    */
  def trainBpe(corpus: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2L, maxLocalVocab: Long = 500000L)
      : Seq[(String, String)] = {
    require(numMerges >= 0 && numMerges <= 65536,
      s"numMerges must be in [0, 65536], got $numMerges")
    require(minPairCount >= 1, s"minPairCount must be >= 1")
    val words = corpus
      .select(explode(tokens(col(textCol))).as("__word"))
      .where(length(col("__word")) > 0)
      .groupBy("__word").agg(count(lit(1)).as("__cnt"))
      .persist()
    try {
      // the word frame is Heaps'-law small; below the threshold the
      // merge rounds run driver-local over the collected counts (same
      // trade as Dedup's union-find-under-1M-edges) — ZERO per-merge
      // Spark jobs. Both paths share bpeEncodeWord + the byte-wise
      // tie-break, so they are pinned identical (BpeSpec).
      if (words.count() <= maxLocalVocab) {
        val wc = words.collect()
          .map(r => (r.getString(0), r.getLong(1)))
        trainBpeLocal(wc, numMerges, minPairCount)
      } else {
        val merges =
          scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        var go = numMerges > 0
        while (go && merges.length < numMerges) {
          val syms = graft.functions.GraftFunctions
            .bpeEncode(col("__word"), merges.toList)
          val top = words
            .select(col("__cnt"), syms.as("__s"))
            .where(size(col("__s")) >= 2)
            .select(col("__cnt"), explode(transform(col("__s"),
              (x, i) => struct(x.as("l"),
                element_at(col("__s"), i + lit(2)).as("r")))).as("__p"))
            .where(col("__p.r").isNotNull)
            .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
            .agg(sum("__cnt").as("n"))
            .orderBy(desc("n"), col("l"), col("r"))
            .limit(1).collect()
          if (top.isEmpty || top(0).getAs[Long]("n") < minPairCount)
            go = false
          else
            merges += ((top(0).getAs[String]("l"),
              top(0).getAs[String]("r")))
        }
        merges.toList
      }
    } finally { words.unpersist(); () }
  }

  /** Unsigned byte-wise UTF-8 comparison — Spark's string sort order
    * (UTF8String.compareTo), NOT Java String's UTF-16 order; the local
    * trainer must tie-break exactly like the distributed `orderBy`.
    */
  private def utf8Compare(a: String, b: String): Int =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))

  /** Driver-local merge rounds over the collected word-count frame:
    * each round re-encodes every word from scratch with the merges so
    * far (exactly what the distributed path's map-side BpeEncode does),
    * counts every adjacent symbol pair weighted by word frequency
    * (overlap-inclusive, like the distributed transform), and picks the
    * top pair by (count desc, byte-wise lex l, r).
    */
  private def trainBpeLocal(wc: Array[(String, Long)], numMerges: Int,
      minPairCount: Long): Seq[(String, String)] = {
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var go = numMerges > 0
    while (go && merges.length < numMerges) {
      val rank = graft.functions.GraftFunctions.bpeRankMap(merges.toList)
      val counts =
        new java.util.HashMap[(String, String), java.lang.Long]()
      wc.foreach { case (w, c) =>
        val syms = graft.functions.GraftFunctions.bpeEncodeWord(w, rank)
        var i = 0
        while (i < syms.length - 1) {
          counts.merge((syms(i), syms(i + 1)), c, (x, y) => x + y)
          i += 1
        }
      }
      var bl: String = null; var br: String = null; var bn = -1L
      counts.forEach { (k, v) =>
        if (v > bn || (v == bn && {
          val c = utf8Compare(k._1, bl)
          c < 0 || (c == 0 && utf8Compare(k._2, br) < 0)
        })) { bl = k._1; br = k._2; bn = v }
      }
      if (bl == null || bn < minPairCount) go = false
      else merges += ((bl, br))
    }
    merges.toList
  }

  /** Per-document n-gram novelty: the fraction of a document's
    * distinct token n-grams that appear in NO other document — the
    * "how much of this text is unique corpus-wide" curation signal
    * (high novelty = original content; near-zero = boilerplate /
    * near-duplicate even when no single pair crosses a dedup
    * threshold). Output: (idCol, n_shingles, novelty), the ratio an
    * exact division of exact counts.
    *
    * Scale shape: one tokenize+shingle pass (map-side, the native
    * n-gram hasher), one shuffle to global shingle document-
    * frequencies, one re-join of the (doc, shingle) frame to its own
    * aggregate — all shingle-frame-sized; the corpus text is scanned
    * once. Same collision stance as the d2/d3 family: shingles
    * compare by 64-bit hash.
    */
  /** PMI collocation mining: the corpus's top adjacent-bigram
    * collocations by pointwise mutual information,
    * pmi(a,b) = ln( (c_ab/n) / ((c_a/u)·(c_b/u)) ) with c_ab the
    * adjacent-pair count (n pairs total) and c_a/c_b unigram counts
    * (u tokens total) — the classic phrase detector (Church & Hanks
    * 1990; word2vec's phrase pass uses the same statistic).
    *
    * Every count is exact; the ONLY floats are the final ratio (pure
    * IEEE arithmetic over exact integers, identical across engines —
    * it drives the top-k cut and the tie-broken ordering) and the ln
    * (emitted raw here; presentation layers round it, since ln's last
    * ulp is libm-specific). Rare-pair noise is gated by `minCount`
    * (PMI famously explodes on hapax pairs).
    *
    * Shape: two explode+count aggregations (bigram, unigram), two
    * equi-joins of the minCount-surviving pairs against the vocab
    * frame, two one-row scalar frames broadcast by crossJoin — no
    * quadratic term anywhere; 100 TB tokenizes map-side and shuffles
    * only (term) / (term_a, term_b) count rows.
    */
  def pmiCollocations(df: DataFrame, textCol: String,
      minCount: Long = 5, topK: Int = 100): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val toks = tokens(col(textCol))
    val uniBase = df.select(explode(toks).as("term"))
    val uni = uniBase.groupBy("term").agg(count(lit(1)).as("__cu"))
    val totU = uniBase.select(count(lit(1)).as("__u"))
    val biBase = df.select(toks.as("__t")).where(size(col("__t")) >= 2)
      .select(explode(zip_with(
        slice(col("__t"), lit(1), size(col("__t")) - 1),
        slice(col("__t"), lit(2), size(col("__t")) - 1),
        (x, y) => struct(x.as("a"), y.as("b")))).as("__p"))
      .select(col("__p.a").as("term_a"), col("__p.b").as("term_b"))
    val pairCounts = biBase.groupBy("term_a", "term_b")
      .agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minCount)
    val totB = biBase.select(count(lit(1)).as("__n"))
    val ua = uni.select(col("term").as("term_a"), col("__cu").as("__ca"))
    val ub = uni.select(col("term").as("term_b"), col("__cu").as("__cb"))
    val ratio = (col("n_pair").cast(DoubleType) *
      col("__u").cast(DoubleType) * col("__u").cast(DoubleType)) /
      (col("__n").cast(DoubleType) * col("__ca").cast(DoubleType) *
        col("__cb").cast(DoubleType))
    pairCounts
      .join(ua, "term_a").join(ub, "term_b")
      .crossJoin(broadcast(totU)).crossJoin(broadcast(totB))
      .withColumn("__ratio", ratio)
      .orderBy(desc("__ratio"), col("term_a"), col("term_b"))
      .limit(topK)
      .select(col("term_a"), col("term_b"), col("n_pair"),
        log(col("__ratio")).as("pmi"))
  }

  /** Dunning log-likelihood-ratio (G², 1993) collocations — the
    * significance-aware sibling of [[pmiCollocations]]: PMI over-ranks
    * hapax pairs (gated there by minCount), while G² weighs the full
    * 2×2 contingency of bigram slots
    *
    *   k11 = c(ab),  k12 = c(a·) − c(ab),  k21 = c(·b) − c(ab),
    *   k22 = B − k11 − k12 − k21
    *
    * with G² = 2·Σ k·ln(k·B / (rowsum·colsum)), zero-count cells
    * contributing zero mass. c(a·)/c(·b) are FIRST/SECOND-slot bigram
    * counts (not unigram counts), so the contingency is exactly over B
    * bigram events and every cell is a nonneg exact integer.
    *
    * Determinism: counts are exact; each cell term is one fixed IEEE
    * ln sequence, the four terms fold in a fixed order, ranking uses
    * the raw double, and `llr` is returned RAW — a caller that
    * publishes it cross-engine rounds at the call site (t41 publishes
    * round-6; ADVICE r13). Scale: one tokenize pass, two
    * (slot, term) count shuffles + one pair-count shuffle — the PMI
    * shape with two narrow extra aggregates.
    */
  def llrCollocations(df: DataFrame, textCol: String,
      minCount: Long = 5, topK: Int = 100): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val toks = tokens(col(textCol))
    val biBase = df.select(toks.as("__t")).where(size(col("__t")) >= 2)
      .select(explode(zip_with(
        slice(col("__t"), lit(1), size(col("__t")) - 1),
        slice(col("__t"), lit(2), size(col("__t")) - 1),
        (x, y) => struct(x.as("a"), y.as("b")))).as("__p"))
      .select(col("__p.a").as("term_a"), col("__p.b").as("term_b"))
    val pairCounts = biBase.groupBy("term_a", "term_b")
      .agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minCount)
    val firstSlot = biBase.groupBy("term_a").agg(count(lit(1)).as("__ca"))
    val secondSlot = biBase.groupBy("term_b").agg(count(lit(1)).as("__cb"))
    val totB = biBase.select(count(lit(1)).as("__n"))
    val k11 = col("n_pair").cast(DoubleType)
    val k12 = (col("__ca") - col("n_pair")).cast(DoubleType)
    val k21 = (col("__cb") - col("n_pair")).cast(DoubleType)
    val k22 = (col("__n") - col("__ca") - col("__cb") + col("n_pair"))
      .cast(DoubleType)
    val nD = col("__n").cast(DoubleType)
    val caD = col("__ca").cast(DoubleType)
    val cbD = col("__cb").cast(DoubleType)
    // rowsums: (k11+k12)=c(a.), (k21+k22)=n-c(a.); colsums: c(.b), n-c(.b)
    def cell(k: Column, rowSum: Column, colSum: Column): Column =
      when(k > 0.0, k * log(k * nD / (rowSum * colSum))).otherwise(lit(0.0))
    val g2 = lit(2.0) * (cell(k11, caD, cbD) +
      cell(k12, caD, nD - cbD) +
      cell(k21, nD - caD, cbD) +
      cell(k22, nD - caD, nD - cbD))
    pairCounts
      .join(firstSlot, "term_a").join(secondSlot, "term_b")
      .crossJoin(broadcast(totB))
      .withColumn("__g2", g2)
      .orderBy(desc("__g2"), col("term_a"), col("term_b"))
      .limit(topK)
      .select(col("term_a"), col("term_b"), col("n_pair"),
        col("__g2").as("llr"))
  }

  /** RAKE keyphrase extraction (Rose et al. 2010) — corpus-level:
    * candidate phrases are maximal stopword-free token runs within
    * each document; each word scores degree/frequency (degree = Σ of
    * the lengths of the phrase instances containing it, frequency =
    * its instance count); a phrase scores the sum of its words'
    * scores (with multiplicity). The cheap, language-light keyphrase
    * miner that needs only a stopword list.
    *
    * Determinism: all counts exact; each word score is ONE double
    * division; phrase scores fold the per-word doubles through
    * DECIMAL(38,18) (fold-order free), and BOTH the top-k cut and the
    * output order use that exact decimal (desc, then phrase) — the
    * published score is the round-6 double.
    *
    * Scale shape: one tokenize pass, one per-doc position window
    * (docs parallelize), two vocabulary-sized count shuffles, one
    * phrase-text aggregation — never an all-pairs structure.
    */
  def rakeKeyphrases(df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String], topK: Int = 50): DataFrame = {
    require(stopwords.nonEmpty, "RAKE needs a stopword list")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol).as("__doc"),
      posexplode(tokens(col(textCol))).as(Seq("__i", "__tok")))
    val isStop = col("__tok").isInCollection(stopwords)
    val w = Window.partitionBy(col("__doc")).orderBy(col("__i"))
    val phrases = base
      .withColumn("__isl", sum(when(isStop, 1L).otherwise(0L)).over(w))
      // an empty token only arises from an empty/whitespace doc (the
      // tokenizer splits trimmed text) — it must not form a "" phrase
      .where(!isStop && length(col("__tok")) > 0)
      .groupBy(col("__doc"), col("__isl"))
      .agg(sort_array(collect_list(struct(col("__i"), col("__tok"))))
        .as("__ts"))
      .select(
        concat_ws(" ", expr("transform(__ts, x -> x.__tok)")).as("phrase"),
        size(col("__ts")).cast("long").as("__len"))
    val stats = phrases
      .select(col("__len"), explode(split(col("phrase"), " ")).as("__w"))
      .groupBy(col("__w"))
      .agg(count(lit(1)).as("__freq"), sum(col("__len")).as("__deg"))
    val uniq = phrases.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"))
    val wscore = (col("__deg").cast(DoubleType) /
      col("__freq").cast(DoubleType)).cast(DecimalType(38, 18))
    val scored = uniq
      .select(col("phrase"), explode(split(col("phrase"), " ")).as("__w"))
      .join(stats, "__w")
      .groupBy(col("phrase"))
      .agg(sum(wscore).as("__sc"))
    uniq.join(scored, "phrase")
      .orderBy(col("__sc").desc, col("phrase"))
      .limit(topK)
      .select(col("phrase"), col("n_occurrences"),
        (round(col("__sc").cast(DoubleType), 6) + lit(0.0))
          .as("rake_score"))
  }

  def noveltyScore(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val sh = df.select(col(idCol), explode(array_distinct(
      graft.functions.GraftFunctions.ngramHashes(
        tokens(col(textCol)), n))).as("__sh"))
    // sh is distinct per (doc, shingle) => count = document frequency
    val dfreq = sh.groupBy("__sh").agg(count(lit(1)).as("__df"))
    sh.join(dfreq, "__sh")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_shingles"),
        (sum(when(col("__df") === 1L, 1L).otherwise(0L))
          .cast(DoubleType) / count(lit(1)).cast(DoubleType))
          .as("novelty"))
  }

  /** Per-group vocabulary statistics — the corpus-health profile read
    * before mixing sources: token volume, distinct vocabulary, hapax
    * legomena (terms seen exactly once in the group — the Zipf tail
    * whose share predicts OCR noise / boilerplate), and the type-token
    * ratio. Every output is an exact count or one deterministic double
    * division of exact counts — fully cross-engine exact.
    *
    * Scale shape: one tokenize pass (map-side explode) → one shuffle
    * to (group, term) counts → one partial-aggregated reduction per
    * group. Vocabulary-sized intermediate, never corpus-sized rows
    * past the first shuffle.
    */
  def vocabStats(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val terms = df.select(col(groupCol).as("__g"),
      explode(tokens(col(textCol))).as("__term"))
      .where(length(col("__term")) > 0)
    terms.groupBy(col("__g"), col("__term"))
      .agg(count(lit(1)).as("__tc"))
      .groupBy(col("__g").as(groupCol))
      .agg(
        sum(col("__tc")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("__tc") === 1L, 1L).otherwise(0L)).as("n_hapax"),
        (count(lit(1)).cast(DoubleType) /
          sum(col("__tc")).cast(DoubleType)).as("type_token_ratio"))
  }

  /** Script-mix profile — the homoglyph-spoof / encoding-mess signal a
    * web-crawl filter needs: per document, how many whitespace tokens
    * contain Latin, Cyrillic, CJK, or Greek characters, and how many
    * mix ≥ 2 of those scripts INSIDE one token (the confusable-spam
    * fingerprint — "pаypal" with a Cyrillic а). Script classes are
    * EXPLICIT codepoint ranges (not \p{...} property tables, which
    * differ between regex engines), so Java and RE2 agree by
    * construction. Higher-order array ops over the token split — pure
    * map-side, zero shuffles.
    */
  def scriptMix(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val latin = "[A-Za-z]"
    val cyr = "[Ѐ-ӿ]"
    val cjk = "[一-鿿]"
    val greek = "[Ͱ-Ͽ]"
    val toks = filter(tokens(col(textCol)), t => length(t) > 0)
    def nWith(re: String): Column =
      size(filter(toks, t => t.rlike(re))).cast(LongType)
    val nScripts = (t: Column) =>
      Seq(latin, cyr, cjk, greek)
        .map(re => when(t.rlike(re), 1).otherwise(0))
        .reduce(_ + _)
    df.select(col(idCol),
      size(toks).cast(LongType).as("n_tokens"),
      nWith(latin).as("n_latin"),
      nWith(cyr).as("n_cyrillic"),
      nWith(cjk).as("n_cjk"),
      nWith(greek).as("n_greek"),
      size(filter(toks, t => nScripts(t) >= 2)).cast(LongType)
        .as("n_mixed"))
  }

  /** Flesch reading-ease — the classic length-weighted readability
    * score, a standard quality-filter feature beside [[qualityScore]]
    * and the Gopher rules:
    *
    *   206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
    *
    * with the standard relational approximations: words = whitespace
    * tokens, syllables = vowel-group count (consecutive [aeiouy] runs
    * — word boundaries split runs, so the per-word sum IS the whole-
    * text count: one regexp_count, no per-word loop), sentences =
    * terminator runs [.!?]+ floored at 1. All three are exact integer
    * counts; the score is a fixed IEEE sequence of two divisions —
    * bit-identical across engines, no rounding convention needed.
    * Zero-word docs yield NULL (no text to score).
    *
    * Map-side only: one scan, zero shuffles at any corpus size.
    */
  def fleschScore(text: Column): Column = {
    val words = regexp_count(trim(text), lit("\\S+")).cast(DoubleType)
    val syll = regexp_count(lower(text), lit("[aeiouy]+"))
      .cast(DoubleType)
    val sents = greatest(regexp_count(text, lit("[.!?]+")), lit(1))
      .cast(DoubleType)
    when(words > 0,
      lit(206.835) - lit(1.015) * (words / sents) -
        lit(84.6) * (syll / words))
      .otherwise(lit(null).cast(DoubleType))
  }

  /** Jensen–Shannon divergence between the unigram distributions of
    * every pair of corpus slices (languages, sources, time buckets) —
    * the symmetric, bounded [0, ln 2] distribution distance for "how
    * different is this domain's vocabulary?" (the corpus-mixing /
    * drift question; cf. DSIR's importance weights, which need exactly
    * these per-slice unigram models).
    *
    * Decomposition that never densifies the term × slice grid: over
    * SHARED terms, JSD(p,q) = ½Σ p·ln(2p/(p+q)) + ½Σ q·ln(2q/(p+q));
    * a term one side lacks contributes exactly ½p·ln 2, so the
    * disjoint mass is ½·ln 2·((1−Σ_shared p) + (1−Σ_shared q)) in
    * closed form. Two slices sharing nothing get the ln 2 maximum.
    *
    * Determinism: every p is ONE division of exact counts; each
    * contribution is a fixed IEEE op sequence from there, accumulated
    * through DECIMAL(28,18) (fold-order independent); the final
    * assembly is spelled identically in the oracle; round-6 absorbs
    * the wide-decimal→double cast ulp.
    *
    * Scale shape: one tokenize shuffle to (slice, term) counts, one
    * term-keyed join for the shared-term contributions (both sides
    * shuffle on term — no broadcast of a vocabulary). Slice
    * cardinality is expected SMALL (languages, domains, buckets): the
    * join fans out per slice pair sharing a term.
    */
  def jsDivergence(df: DataFrame, sliceCol: String,
      textCol: String): DataFrame = {
    val d = DecimalType(28, 18)
    val counts = df.where(col(sliceCol).isNotNull)
      .select(col(sliceCol).as("__s"),
        explode(tokens(col(textCol))).as("__t"))
      .where(length(col("__t")) > 0)
      .groupBy(col("__s"), col("__t")).agg(count(lit(1)).as("__c"))
    val totals = counts.groupBy(col("__s")).agg(sum(col("__c")).as("__n"))
      .localCheckpoint(true) // tiny; reread by probs AND the pair grid
    val probs = counts.join(totals, "__s")
      .select(col("__s"), col("__t"),
        (col("__c").cast(DoubleType) / col("__n").cast(DoubleType))
          .as("__p"))
    val a = probs.select(col("__s").as("__sa"), col("__t"),
      col("__p").as("__pa"))
    val b = probs.select(col("__s").as("__sb"), col("__t").as("__tb"),
      col("__p").as("__pb"))
    val m = col("__pa") + col("__pb")
    val shared = a
      .join(b, col("__t") === col("__tb") && col("__sa") < col("__sb"))
      .groupBy(col("__sa"), col("__sb"))
      .agg(count(lit(1)).as("__nsh"),
        sum((col("__pa") * log(lit(2.0) * col("__pa") / m)).cast(d))
          .as("__ca"),
        sum((col("__pb") * log(lit(2.0) * col("__pb") / m)).cast(d))
          .as("__cb"),
        sum(col("__pa").cast(d)).as("__ma"),
        sum(col("__pb").cast(d)).as("__mb"))
    val grid = totals.select(col("__s").as("__ga"), col("__n").as("n_a"))
      .join(totals.select(col("__s").as("__gb"), col("__n").as("n_b")),
        col("__ga") < col("__gb"))
    val ln2 = log(lit(2.0))
    val nats = (((coalesce(col("__ca").cast(DoubleType), lit(0.0)) +
      ln2 * (lit(1.0) - coalesce(col("__ma").cast(DoubleType),
        lit(0.0)))) +
      coalesce(col("__cb").cast(DoubleType), lit(0.0))) +
      ln2 * (lit(1.0) - coalesce(col("__mb").cast(DoubleType),
        lit(0.0)))) * lit(0.5)
    grid.join(shared,
        col("__ga") === col("__sa") && col("__gb") === col("__sb"),
        "left_outer")
      .select(col("__ga").as(sliceCol + "_a"),
        col("__gb").as(sliceCol + "_b"),
        col("n_a"), col("n_b"),
        coalesce(col("__nsh"), lit(0L)).as("n_terms_shared"),
        (round(nats, 6) + lit(0.0)).as("jsd_nats"),
        (round(nats / ln2, 6) + lit(0.0)).as("jsd_bits"))
  }

  /** Zipf fit — OLS of ln(frequency) on ln(rank) over the corpus's
    * `topK` terms. Natural corpora follow freq ∝ rank^(−s) with
    * s ≈ 1; a slope far from −1 (or a low R²) is a corpus-health
    * smell: template/boilerplate floods flatten the head, scraped
    * spam fattens the tail (the [[vocabStats]] question, answered
    * against the whole rank curve instead of two scalars).
    *
    * Determinism: ranks and frequencies are exact integers
    * (freq desc, term asc — a total order); each ln and each product
    * is one correctly-rounded IEEE op from exact inputs, and the five
    * OLS moments accumulate through DECIMAL(28,18) so the sums are
    * fold-order independent. The closed-form slope/intercept/R² are
    * then a FIXED sequence of double ops, spelled identically in the
    * oracle; round-6 absorbs the wide-decimal→double cast ulp.
    *
    * Scale shape: one tokenize shuffle to term counts, a top-K cut
    * (K rows — the only single-task step is ranking K rows), one
    * moment aggregate. The corpus is scanned once.
    */
  def zipfFit(df: DataFrame, textCol: String, topK: Int = 100)
      : DataFrame = {
    require(topK >= 3, s"topK must be >= 3, got $topK")
    import org.apache.spark.sql.expressions.Window
    val tf = df.select(explode(tokens(col(textCol))).as("__term"))
      .where(length(col("__term")) > 0)
      .groupBy(col("__term")).agg(count(lit(1)).as("__freq"))
      .orderBy(desc("__freq"), asc("__term"))
      .limit(topK)
    // rank the K survivors — a K-row single partition by construction
    val ranked = tf.withColumn("__rank", row_number()
      .over(Window.orderBy(desc("__freq"), asc("__term"))))
    val d = DecimalType(28, 18)
    val x = log(col("__rank").cast(DoubleType))
    val y = log(col("__freq").cast(DoubleType))
    val m = ranked.agg(
      count(lit(1)).as("k"),
      sum(x.cast(d)).cast(DoubleType).as("__sx"),
      sum(y.cast(d)).cast(DoubleType).as("__sy"),
      sum((x * x).cast(d)).cast(DoubleType).as("__sxx"),
      sum((x * y).cast(d)).cast(DoubleType).as("__sxy"),
      sum((y * y).cast(d)).cast(DoubleType).as("__syy"))
    val kD = col("k").cast(DoubleType)
    val cxy = kD * col("__sxy") - col("__sx") * col("__sy")
    val cxx = kD * col("__sxx") - col("__sx") * col("__sx")
    val cyy = kD * col("__syy") - col("__sy") * col("__sy")
    m.select(col("k"),
      (round(cxy / cxx, 6) + lit(0.0)).as("slope"),
      (round((col("__sy") - (cxy / cxx) * col("__sx")) / kD, 6)
        + lit(0.0)).as("intercept"),
      (when(cyy > 0, round((cxy * cxy) / (cxx * cyy), 6) + lit(0.0))
        .otherwise(lit(null).cast(DoubleType))).as("r2"))
  }

  /** Chi-square term–category association — feature selection for
    * corpus curation: which terms are most predictive of a category
    * (language, source, quality bin)? For each (term, category) whose
    * term document-frequency is at least `minDf`, the 2×2 doc-presence
    * contingency statistic
    *
    *   χ² = N·(n11·n22 − n12·n21)² / (nt·(N−nt)·nc·(N−nc))
    *
    * with n11 = docs in the category containing the term, nt / nc the
    * term / category marginals, N the corpus size. Every input is an
    * exact integer count and the χ² chain is a FIXED order of IEEE
    * double ops (casts first, left-associated products), so the score
    * is bit-identical across engines — no rounding convention needed,
    * unlike the ln-based tf-idf.
    *
    * Scale shape: one tokenize+distinct pass (map-side explode), one
    * shuffle to (term, category) counts; term marginals re-aggregate
    * from that frame (no second corpus pass); category marginals and N
    * are tiny broadcast frames. Top-k by (χ² desc, term, category) —
    * a total order, so the cut is deterministic.
    */
  def chiSquareTerms(df: DataFrame, idCol: String, textCol: String,
      catCol: String, minDf: Long, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val present = df.select(col(catCol).as("cat"), col(idCol),
      explode(array_distinct(tokens(col(textCol)))).as("term"))
    // one row per (doc, term) after the distinct — counts are presence
    val tc = present.groupBy("term", "cat").agg(count(lit(1)).as("__n11"))
    val termTot = tc.groupBy("term").agg(sum("__n11").as("__nt"))
    val catTot = df.groupBy(col(catCol).as("__cat2"))
      .agg(count(lit(1)).as("__nc"))
    val total = df.agg(count(lit(1)).as("__nn"))
    val n11 = col("__n11").cast(DoubleType)
    val nt = col("__nt").cast(DoubleType)
    val nc = col("__nc").cast(DoubleType)
    val nn = col("__nn").cast(DoubleType)
    val diff = n11 * (nn - nt - nc + n11) - (nt - n11) * (nc - n11)
    val chi2 = nn * (diff * diff) /
      (nt * (nn - nt) * nc * (nn - nc))
    tc.join(termTot, "term").where(col("__nt") >= minDf)
      .join(broadcast(catTot), col("cat") === col("__cat2"))
      .crossJoin(broadcast(total))
      // degenerate marginals (term in every doc / single-category
      // corpus) have no 2x2 signal and a zero denominator
      .where(col("__nt") < col("__nn") && col("__nc") < col("__nn"))
      .withColumn("chi2", chi2)
      .orderBy(desc("chi2"), col("term"), col("cat"))
      .limit(k)
      .select(col("term"), col("cat"), col("chi2"))
  }

  /** BM25 keyword relevance (Robertson et al., Okapi BM25) — the
    * retrieval scoring [[tfidfTopK]] approximates, with saturation (k1)
    * and length normalization (b):
    *
    *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *   idf(t)   = ln(1 + (N − df + 0.5)/(df + 0.5))
    *
    * ONE corpus pass: tokens bucket to (query term | "" for everything
    * else) and count by (doc, bucket) — the checkpointed frame is
    * ≤ |docs|×(|Q|+1) narrow rows, from which doc lengths, N, avgdl,
    * document frequencies, and term frequencies all derive without
    * re-tokenizing (the frame is doc-count-sized, so the checkpoint
    * trades bounded executor storage for two full text re-scans).
    * N/avgdl are driver scalars; per-term document frequencies are
    * query-sized and broadcast. Per-term contributions go through exact
    * decimal summation (partition-order independent), and every input
    * to the floating math is a ratio of exact counts — so the score is
    * re-derivable in SQL to the usual round-6 convention. Returns
    * (idCol, score, n_hits) for documents matching ≥ 1 query term;
    * documents with null text drop (nothing to score).
    */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    require(queryTerms.forall(_.nonEmpty),
      "bm25 query terms must be non-empty strings (\"\" is the bucket " +
        "sentinel for non-query tokens)")
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val counts = toks
      .withColumn("term", when(col("term").isin(queryTerms: _*),
        col("term")).otherwise(lit("")))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast(DoubleType).as("c"))
      .localCheckpoint(true)
    // integer counts sum exactly in doubles (< 2^53)
    val lens = counts.groupBy(col(idCol)).agg(sum(col("c")).as("dl"))
    val stats = lens.agg(count(lit(1)), sum(col("dl"))).head
    val n = stats.getLong(0).toDouble
    require(n > 0, "bm25: corpus is empty")
    val avgdl = stats.getDouble(1) / n
    val tf = counts.where(col("term") =!= "")
      .withColumnRenamed("c", "tf")
    val dfreq = tf.groupBy("term")
      .agg(count(lit(1)).cast(DoubleType).as("df"))
      .withColumn("idf",
        log(lit(1.0) + (lit(n) - col("df") + lit(0.5))
          / (col("df") + lit(0.5))))
    tf.join(broadcast(dfreq), "term")
      .join(lens, idCol)
      .withColumn("__s", col("idf") * (col("tf") * lit(k1 + 1.0))
        / (col("tf") + lit(k1) * (lit(1.0 - b)
          + lit(b) * (col("dl") / lit(avgdl)))))
      .groupBy(col(idCol))
      .agg(
        sum(col("__s").cast(DecimalType(28, 18))).cast(DoubleType)
          .as("score"),
        count(lit(1)).cast(IntegerType).as("n_hits"))
  }

  /** BM25 retrieval JOIN — the text-side analog of the k-NN join
    * ([[graft.operators.Similarity.knnJoin]]): score EVERY query in a
    * query table against EVERY matching document via an inverted-index
    * shuffle join and keep the top `k` per query. This is the shape a
    * 100 TB corpus needs for batch retrieval (hard-negative mining,
    * RAG candidate generation, query-set evaluation): [[bm25]] handles
    * ONE keyword query driver-side; this one handles a query TABLE
    * with no driver loop and no broadcast of either side.
    *
    * Plan shape, in order:
    *  1. ONE tokenize pass builds the postings frame (doc, term, tf) —
    *     the inverted index — checkpointed and reused for doc lengths,
    *     document frequencies, and the retrieval join (no re-scan).
    *  2. N and avgdl are two driver scalars; per-term df/idf stays a
    *     DISTRIBUTED frame keyed by term (vocabulary-sized — at corpus
    *     scale it must not broadcast unconditionally; AQE may choose to).
    *  3. The retrieval join shuffles postings ⋈ query terms on the term
    *     key. Skew bound: terms whose df exceeds `maxDfRatio`·N are
    *     pruned BEFORE the join (classic stop-term pruning — their idf
    *     is near zero and their postings rows are the skewed ones).
    *  4. Per-(query, doc) scores sum exactly as decimals
    *     (partition-order independent), are rounded to 6 decimals and
    *     zero-canonicalized BEFORE ranking (so rank ties resolve
    *     identically in any engine re-deriving the score), and the
    *     per-query top-k runs through the bounded mergeable
    *     `graft_topk` aggregate — the shuffle carries ≤ k pairs per
    *     (query, partition), never every candidate.
    *
    * Query term semantics: the query's DISTINCT whitespace tokens
    * (bag-of-words retrieval ignores query-side repetition, Robertson's
    * qtf≈1 regime). Empty tokens drop on both sides. Returns
    * (qidCol, idCol, score, rank) for the top `k` docs per query,
    * rank 1-based in (score DESC, doc ASC) order; queries matching no
    * indexed term produce no rows. Both id columns must be LongType
    * (the mergeable aggregate's key contract).
    */
  def bm25Retrieval(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      maxDfRatio: Double = 0.5): DataFrame = {
    require(k >= 1, s"bm25Retrieval: k must be positive, got $k")
    require(maxDfRatio > 0.0 && maxDfRatio <= 1.0,
      s"bm25Retrieval: maxDfRatio must be in (0, 1], got $maxDfRatio")
    require(qidCol != idCol, "bm25Retrieval: qidCol must differ from " +
      s"idCol (both '$idCol') — the output carries one column per side")
    require(Seq(docs.schema, queries.schema).zip(Seq(idCol, qidCol))
      .forall { case (sc, c) =>
        sc.fields.find(_.name == c).map(_.dataType).contains(LongType) },
      "bm25Retrieval: id columns must be LongType (graft_topk key)")
    // fanned out before tokenization (r15 — a one-file corpus scan is
    // one task; exact counts are partitioning-insensitive)
    val tf = graft.operators.Fanout.fanOut(
        docs.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(tokens(col(textCol))).as("__term"))
      .where(col("__term") =!= "")
      .groupBy(col(idCol), col("__term"))
      .agg(count(lit(1)).cast(DoubleType).as("__tf"))
      .localCheckpoint(true) // postings built once; reused 3×
    // integer counts sum exactly in doubles (< 2^53)
    val lens = tf.groupBy(col(idCol)).agg(sum(col("__tf")).as("__dl"))
    val stats = lens.agg(count(lit(1)), sum(col("__dl"))).head
    val n = stats.getLong(0).toDouble
    require(n > 0, "bm25Retrieval: corpus is empty")
    val avgdl = stats.getDouble(1) / n
    val dfreq = tf.groupBy(col("__term"))
      .agg(count(lit(1)).cast(DoubleType).as("__df"))
      .where(col("__df") <= lit(maxDfRatio) * lit(n))
      .withColumn("__idf",
        log(lit(1.0) + (lit(n) - col("__df") + lit(0.5))
          / (col("__df") + lit(0.5))))
    bm25Tail(tf, lens, dfreq, queries, idCol, qidCol, qtextCol,
      k, k1, b, avgdl)
  }

  /** Shared tail of the BM25 retrieval family ([[bm25Retrieval]] and
    * `Bm25Index.search`): query-term explode/distinct, term-keyed
    * shuffle join against the (already df-pruned, idf-carrying)
    * postings, decimal-exact per-(query,doc) score, round-6
    * canonicalization BEFORE ranking, bounded mergeable per-query
    * top-k. One tail so the ad-hoc and index-backed forms cannot
    * diverge. `tf` = (idCol, __term, __tf); `lens` = (idCol, __dl);
    * `dfreq` = (__term, __idf) with stop-terms already removed.
    */
  private[operators] def bm25Tail(tf: DataFrame, lens: DataFrame,
      dfreq: DataFrame, queries: DataFrame, idCol: String,
      qidCol: String, qtextCol: String, k: Int, k1: Double, b: Double,
      avgdl: Double): DataFrame = {
    // the query id rides under a reserved alias so qidCol == idCol
    // (a self-retrieval corpus) cannot make the joins ambiguous
    val qterms = queries
      .select(col(qidCol).as("__qid"),
        explode(tokens(col(qtextCol))).as("__term"))
      .where(col("__term") =!= "")
      .distinct()
    // Join strategy is DELIBERATE (r15, guide §3.1): the query batch is
    // the bounded-small side by contract, so it is broadcast and joined
    // to the postings FIRST (pruning the corpus to query terms before
    // anything else). Left to size estimates, the planner read the
    // postings' compressed on-disk footprint as "small", broadcast the
    // million-row corpus side, and built its hash relation
    // single-threaded on the driver — 2.1 s of t24b's 4.2 s, and at
    // 100 TB an outright OOM.
    // ... and the postings side fans out before the scoring joins: a
    // 32-file index scan packs into 1-2 splits under the 4 MB open-cost
    // charge, so the whole score+partial-agg stage otherwise inherits
    // one task (3.2 s of t24b). At scale neither branch fires.
    val scored = graft.operators.Fanout.fanOut(tf)
      .join(broadcast(qterms), "__term")
      .join(dfreq, "__term")
      .join(lens, idCol)
      .withColumn("__s", col("__idf") * (col("__tf") * lit(k1 + 1.0))
        / (col("__tf") + lit(k1) * (lit(1.0 - b)
          + lit(b) * (col("__dl") / lit(avgdl)))))
      .groupBy(col("__qid"), col(idCol))
      .agg((round(sum(col("__s").cast(DecimalType(28, 18)))
        .cast(DoubleType), 6) + lit(0.0)).as("score"))
    scored.groupBy(col("__qid"))
      .agg(graft.functions.GraftFunctions
        .topKPairs(col(idCol), col("score"), k).as("__top"))
      .select(col("__qid"), posexplode(col("__top")).as(Seq("__rk", "__p")))
      .select(col("__qid").as(qidCol), col("__p.id").as(idCol),
        col("__p.score").as("score"),
        (col("__rk") + 1).cast(IntegerType).as("rank"))
  }

  /** Corpus-frequency line dedup — C4-style boilerplate removal
    * ("we discard … any line occurring ≥ 3 times in the corpus"):
    * every document's lines are counted corpus-wide (normalized by
    * lower+trim, keyed by md5 so the counting shuffle carries a 32-char
    * digest, never the line text); lines whose corpus frequency reaches
    * `minCount` are removed from every document; surviving lines
    * reassemble in their original order. Documents left with no lines
    * drop (the C4 convention) unless `keepEmpty`, which retains them
    * with an empty text.
    *
    * Shape at scale: one narrow groupBy on the digest builds the
    * boilerplate set — which is SMALL (only lines repeated ≥ minCount
    * survive the HAVING), so the anti-join against it broadcasts under
    * AQE — then one groupBy(id) reassembles. The line text crosses the
    * wire only in the reassembly shuffle, the same cost class as
    * chunking. split('\n') / string_split both KEEP trailing empty
    * lines, and lower/trim normalize identically in both engines, so
    * the operator is fully hash-oracled (t13_line_dedup).
    */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long = 3, keepEmpty: Boolean = false): DataFrame = {
    require(minCount >= 2, s"minCount $minCount would delete every line")
    val parts = docs.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
      .withColumn("__k", md5(lower(trim(col("__line")))))
    val boiler = parts.groupBy("__k")
      .agg(count(lit(1)).as("__c"))
      .where(col("__c") >= minCount)
      .select("__k")
    val rebuilt = parts.join(boiler, Seq("__k"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
          _.getField("__line")), "\n").as(textCol))
    if (keepEmpty)
      docs.select(col(idCol)).join(rebuilt, Seq(idCol), "left")
        .withColumn(textCol, coalesce(col(textCol), lit("")))
    else rebuilt
  }

  /** INTRA-document line dedup: within each doc, keep only the first
    * occurrence of each line (exact match), preserving order — the
    * within-page half of C4's repeated-line cleaning ([[dedupLines]] is
    * the corpus-frequency half). Pure map-side: `array_distinct` is
    * documented order-preserving-first-occurrence, so this is one
    * codegen'd expression per row, zero shuffle at any scale.
    */
  def dedupLinesWithinDoc(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn(textCol,
      array_join(array_distinct(split(col(textCol), "\n")), "\n"))

  /** Corpus-level boilerplate removal — the CCNet/C4 line-dedup step
    * that [[dedupLinesWithinDoc]]'s intra-document form cannot do: a
    * non-empty line appearing in at least `minDocFreq` DISTINCT
    * documents (cookie banners, nav bars, license footers) is dropped
    * from EVERY document; the survivors reassemble in original order.
    * Emits (id, clean_text, n_lines_kept, n_lines_dropped); a document
    * whose every line is boilerplate survives with empty text (the
    * length/quality gates downstream are the right place to drop it).
    *
    * Scale shape: one explode, one distinct + partial-agg count per
    * line, one anti-join of the (small, post-threshold) boilerplate
    * set against the exploded lines, one per-doc ordered reassembly —
    * all standard shuffles, nothing driver-sized, no windows.
    */
  def stripBoilerplate(docs: DataFrame, idCol: String, textCol: String,
      minDocFreq: Int): DataFrame = {
    require(minDocFreq >= 2,
      s"minDocFreq must be >= 2 (1 would drop every line), got $minDocFreq")
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("__ord", "__line")))
    val boiler = lines.where(col("__line") =!= "")
      .select(col(idCol), col("__line")).distinct()
      .groupBy("__line").agg(count(lit(1)).as("__df"))
      .where(col("__df") >= minDocFreq)
      .select("__line")
    val kept = lines.join(boiler, Seq("__line"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__ord"), col("__line")))),
          e => e.getField("__line")), "\n").as("clean_text"),
        count(lit(1)).as("n_lines_kept"))
    val totals = lines.groupBy(col(idCol))
      .agg(count(lit(1)).as("__total"))
    totals.join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
        (col("__total") - coalesce(col("n_lines_kept"), lit(0L)))
          .as("n_lines_dropped"))
  }

  /** Character trigrams of whitespace-normalized lowercase text — the
    * unit of the self-trained LM below. Empty array under 3 chars. The
    * normalization is the expression's single child (evaluated once per
    * row) and the gram split is one native pass
    * ([[graft.functions.GraftFunctions.CharNgrams]]) — the
    * transform+substr composition was O(len²) per document.
    */
  def charTrigrams(text: Column): Column =
    graft.functions.GraftFunctions.charNgrams(
      regexp_replace(lower(trim(text)), "\\s+", " "), 3)

  /** Self-trained character-trigram language model: (trigram, ln p)
    * from corpus frequencies — the CCNet/RefinedWeb-style perplexity
    * filter WITHOUT an external model (KenLM's role, reduced to its
    * relational core). One explode + count aggregate over the corpus;
    * the result is vocabulary-sized (≤ alphabet³ rows), always
    * broadcastable.
    */
  def trigramLM(corpus: DataFrame, textCol: String): DataFrame = {
    // ONE corpus pass: the vocab-sized count frame is checkpointed and
    // the grand total folds from IT (a cross join of a 1-row total
    // frame would plan a broadcast nested-loop join — benign but
    // rightly flagged by the engine's plan audit)
    val counts = corpus
      .select(explode(charTrigrams(col(textCol))).as("tri"))
      .groupBy("tri").agg(count(lit(1)).cast(DoubleType).as("__cnt"))
      .localCheckpoint(true)
    // an empty corpus (or one where every doc normalizes to < 3 chars)
    // yields a null sum — fail with a readable error, not an NPE
    val totalRow = counts.agg(sum(col("__cnt"))).head
    require(!totalRow.isNullAt(0),
      "cannot train a trigram LM: corpus is empty or no document is at " +
        "least 3 normalized characters long")
    val total = totalRow.getDouble(0)
    counts.select(col("tri"), log(col("__cnt") / lit(total)).as("logp"))
  }

  /** Per-document perplexity under a trigram LM: exp of the mean
    * negative log-prob of the document's trigrams; unseen trigrams take
    * `oovLogp` (default: effectively -inf-ish floor ln(1e-9)). The mean
    * goes through exact decimal summation so it is partition-order
    * independent (same discipline as Analytics.stableAvg). Map-side
    * broadcast join + one partial-aggregated groupBy(id) — no corpus
    * rescan, 100 TB-shaped. Documents under 3 normalized chars emit no
    * trigrams and drop (nothing to score).
    */
  def perplexity(docs: DataFrame, idCol: String, textCol: String,
      lm: DataFrame, oovLogp: Double = math.log(1e-9)): DataFrame = {
    val tris = docs.select(col(idCol),
      explode(charTrigrams(col(textCol))).as("tri"))
    tris.join(broadcast(lm), Seq("tri"), "left")
      .groupBy(col(idCol))
      .agg(
        exp(-(sum(coalesce(col("logp"), lit(oovLogp))
          .cast(DecimalType(28, 18))).cast(DoubleType)
          / count(lit(1)))).as("ppl"),
        count(lit(1)).cast(IntegerType).as("n_trigrams"))
  }

  /** Full per-document profile in one map-side pass. */
  def profile(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_chars_m", length(t))
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("n_subwords", subwordCount(t))
      .withColumn("lang_id", langId(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("fingerprint", fingerprint(t))
  }

  /** Sequence packing: assign token-counted chunks to fixed-budget
    * training sequences — the step between chunking and batch assembly
    * in an LLM data pipeline. Deterministic next-fit-with-overflow in
    * one window pass: chunks are laid out in `orderCols` order within
    * each `shardCol` group, and a chunk starts the sequence its
    * preceding token total falls into (`(cumsum - len) / budget`), so a
    * sequence may overrun the budget by at most its last chunk — the
    * concat-then-truncate convention, fully relational (true bin
    * packing is inherently sequential and would need per-partition
    * imperative state for zero-overflow fits).
    *
    * Scale: ONE window per shard — the shard column (source, language,
    * date bucket…) is the parallelism unit; never pack a 100 TB corpus
    * in a single global order.
    *
    * Output adds `seq` (shard-local sequence id) and `seq_offset`
    * (token offset of the chunk within its sequence).
    */
  def packSequences(chunks: DataFrame, shardCol: Column,
      orderCols: Seq[Column], tokenLen: Column, budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shardCol).orderBy(orderCols: _*)
    val before = sum(tokenLen).over(w) - tokenLen // tokens preceding this chunk
    // floor division, NOT (before / budget).cast(long): Column `/` is
    // double division and a double->long cast truncates while SQL
    // engines' casts round — floor() is unambiguous in both
    chunks
      .withColumn("seq", floor(before / budget).cast(LongType))
      .withColumn("seq_offset", (before % budget).cast(LongType))
  }

  /** Zero-overflow variant of [[packSequences]]: NO sequence ever exceeds
    * the budget — a chunk that would overflow starts a new sequence
    * (classic next-fit). That decision depends on accumulated waste, so
    * it is inherently sequential per shard and runs as per-group
    * imperative state (`flatMapGroups` — the build rules' (d) path, used
    * exactly where relational form cannot express the semantics). A
    * chunk LARGER than the budget gets a sequence of its own (callers
    * should pre-split such chunks). One shuffle on the shard key; memory
    * is O(shard group) per task — shard so groups fit (same contract as
    * any groupBy).
    *
    * Output schema: (shard string, seq, seq_offset, plus the order/len
    * columns as `ord` and `len`) — fixed narrow shape so the group
    * iterator stays typed.
    */
  def packSequencesExact(chunks: DataFrame, shardCol: Column,
      orderCol: Column, tokenLen: Column, budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks
      .select(shardCol.cast("string").as("shard"),
        orderCol.cast("long").as("ord"), tokenLen.cast("long").as("len"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (shard: String, it: Iterator[(String, Long, Long)]) =>
        var seq = 0L
        var used = 0L
        it.toSeq.sortBy(_._2).iterator.map { case (_, ord, len) =>
          if (used > 0 && used + len > budget) { seq += 1; used = 0L }
          val off = used
          used += len
          (shard, ord, len, seq, off)
        }
      }
      .toDF("shard", "ord", "len", "seq", "seq_offset")
  }

  /** Exact duplicated-SPAN removal — the ExactSubstr deduplication of
    * Lee et al. 2022 ("Deduplicating Training Data Makes Language
    * Models Better"), re-expressed relationally: every k-token window
    * that occurs more than once in the corpus keeps only its globally
    * first occurrence (minimum (doc, position)); every other instance
    * marks its k token positions for removal; overlapping marks merge;
    * documents are rebuilt from the surviving tokens (so a long
    * duplicated passage disappears from later docs while its first
    * occurrence — and all unique text — survives verbatim).
    *
    * Scale shape: the shingle count is the corpus-sized shuffle (the
    * relational stand-in for the suffix-array sort); first occurrences
    * come from a `min(struct(doc, pos))` aggregate, which partial-
    * aggregates map-side — a boilerplate shingle with millions of
    * instances never funnels through one sorted window partition. The
    * covered-position explosion is bounded by k × duplicate instances
    * (not corpus size), and the rebuild is one partial-aggregated
    * groupBy(doc) whose state is a single document's tokens. No floats
    * anywhere — the whole operator is exactly re-derivable in SQL.
    *
    * Output: (idCol, clean_text, n_tokens, n_dropped), one row per
    * document with non-null text; documents shorter than k tokens pass
    * through untouched (whitespace-normalized, like every rebuild).
    */
  def dedupSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    require(k >= 2, s"span length k must be at least 2, got $k")
    val toked = tokedFrame(docs, idCol, textCol)
    val shing = shingleFrame(toked, k)
    val firsts = shing.groupBy("sh")
      .agg(min(struct(col("__id"), col("pos"))).as("first"),
        count(lit(1)).as("__n"))
      .where(col("__n") > 1) // unique shingles mark nothing
      .select(col("sh"), col("first"))
    val covered = shing.join(firsts, "sh")
      .where(!(col("__id") === col("first.__id") &&
        col("pos") === col("first.pos")))
      .select(col("__id"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("pos"))
      .distinct()
    rebuildMinus(toked, covered, idCol)
  }

  /** Span-level DECONTAMINATION — [[dedupSpans]]'s machinery pointed at
    * an evaluation set (the GPT-3 report's 13-gram filter, span-surgical
    * instead of whole-doc): every k-token window of a training document
    * that appears ANYWHERE in `eval` is cut (all its instances — there
    * is no legitimate first occurrence of benchmark text in training
    * data), overlapping cuts merge, and the document is rebuilt from
    * the surviving tokens. Whole-doc dropping by overlap ratio is
    * [[graft.operators.Dedup.decontaminate]] (dc1); this keeps the doc
    * and removes the leakage.
    *
    * Scale shape: the eval shingle set is benchmark-sized (distinct
    * k-grams of the eval corpus) and broadcasts; training shingles are
    * map-side; the only training-sized exchanges are the broadcast-join
    * probe and the rebuild groupBy. No floats — fully SQL-re-derivable.
    */
  def decontaminateSpans(docs: DataFrame, idCol: String, textCol: String,
      eval: DataFrame, evalTextCol: String, k: Int = 5): DataFrame = {
    require(k >= 2, s"span length k must be at least 2, got $k")
    val toked = tokedFrame(docs, idCol, textCol)
    val evalShingles = shingleFrame(
      eval.select(lit(0L).as("__id"), tokens(col(evalTextCol)).as("__t")),
      k).select(col("sh")).distinct()
    val covered = shingleFrame(toked, k)
      .join(broadcast(evalShingles), "sh")
      .select(col("__id"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("pos"))
      .distinct()
    rebuildMinus(toked, covered, idCol)
  }

  /** (id, token array) projection shared by the span operators. */
  private def tokedFrame(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("__id"), tokens(col(textCol)).as("__t"))

  /** k-gram shingles with start positions, map-side (guard: sequence()
    * on a doc shorter than k would run DESCENDING, not empty).
    */
  private def shingleFrame(toked: DataFrame, k: Int): DataFrame =
    toked.where(size(col("__t")) >= k)
      .select(col("__id"), posexplode(expr(
        s"transform(sequence(0, size(__t) - $k), " +
          s"i -> array_join(slice(__t, i + 1, $k), ' '))"))
        .as(Seq("pos", "sh")))

  /** Rebuild documents minus the covered token positions: one
    * partial-aggregated groupBy(doc) whose state is a single document's
    * tokens. Output: (idCol, clean_text, n_tokens, n_dropped).
    */
  private def rebuildMinus(toked: DataFrame, covered: DataFrame,
      idCol: String): DataFrame =
    toked.select(col("__id"), posexplode(col("__t")).as(Seq("pos", "tok")))
      .join(covered.withColumn("__dup", lit(1)), Seq("__id", "pos"), "left")
      .groupBy("__id")
      .agg(sort_array(collect_list(
        struct(col("pos"), col("tok"), col("__dup")))).as("__arr"))
      .select(col("__id").as(idCol),
        array_join(transform(
          filter(col("__arr"), x => x.getField("__dup").isNull),
          x => x.getField("tok")), " ").as("clean_text"),
        size(col("__arr")).cast(IntegerType).as("n_tokens"),
        size(filter(col("__arr"), x => x.getField("__dup").isNotNull))
          .cast(IntegerType).as("n_dropped"))

  /** One class of a trained [[NaiveBayesModel]]: its label, ln of the
    * document prior, and the smoothed ln-probability an unseen token
    * takes under it (`ln(1 / (class tokens + |V|))`).
    */
  final case class NaiveBayesClass(cls: String, logPrior: Double,
      oovLogp: Double)

  /** Trained multinomial Naive Bayes model: a sparse vocabulary-sized
    * `(tok, cls, logp)` frame plus the per-class priors/OOV floors
    * (bounded by the label count, held on the driver exactly like IVF
    * centroids). The token frame is vocabulary × classes — far smaller
    * than the corpus, but vocabulary itself grows with corpus size
    * (Heaps' law: typos, URLs, numbers), so [[nbScore]]'s broadcast has
    * a real ceiling at web scale; train with `minCount` pruning (rare
    * tokens carry little evidence and fall to the OOV floor anyway) to
    * keep the model broadcast-sized, the same role feature hashing
    * plays in fastText.
    */
  final case class NaiveBayesModel(tokenLogp: DataFrame,
      classes: Seq[NaiveBayesClass])

  /** Train a multinomial Naive Bayes text classifier with add-one
    * (Laplace) smoothing — the fastText-style LEARNED classifier of
    * CCNet/GPT-3-era quality and language filtering, reduced to its
    * relational core: training is one corpus pass (explode tokens →
    * count by (token, class)), the model is vocabulary-sized, and
    * every arithmetic step is a ratio of exact integer counts — so the
    * whole pipeline is re-derivable in SQL and hash-oracled.
    *
    * `ln P(tok|c) = ln((count(tok,c) + 1) / (tokens(c) + |V|))` with
    * `|V|` the cross-class vocabulary size; priors come from document
    * counts. Rows with a null label are excluded from training (score
    * them with [[nbClassify]] afterwards — that is the point of a
    * classifier). `minCount > 1` drops tokens whose CROSS-CLASS total
    * count is below it from the vocabulary entirely (they score at the
    * OOV floor) — the fastText-style guard that keeps the model
    * broadcast-sized on web-scale vocabularies.
    *
    * At 100 TB: the (token, class) count shuffle is the only
    * text-carrying exchange; the prior pass re-reads the LABEL column
    * only (columnar pruning makes that second scan metadata-weight
    * next to the token pass); class totals and priors are
    * label-count-sized collects (same contract as k-means centroids).
    */
  def trainNaiveBayes(corpus: DataFrame, textCol: String,
      labelCol: String, minCount: Long = 1L): NaiveBayesModel = {
    require(minCount >= 1, s"minCount must be at least 1, got $minCount")
    val labeled = corpus.where(col(labelCol).isNotNull)
      .select(col(labelCol).cast(StringType).as("cls"),
        col(textCol).as("__text"))
    // THE token pass: checkpointed so vocabulary size, class totals,
    // and the model all derive from the count frame without a rescan.
    // minCount pruning is on the cross-class total (a window over the
    // vocab-sized frame, not a corpus rescan) so a token is in the
    // vocabulary for every class or none.
    val tcAll = graft.operators.Fanout.fanOut(labeled)
      .select(col("cls"), explode(tokens(col("__text"))).as("tok"))
      .groupBy("tok", "cls").agg(count(lit(1)).cast(DoubleType).as("__c"))
    val tc = (if (minCount <= 1L) tcAll
      else {
        val wTok = org.apache.spark.sql.expressions.Window.partitionBy("tok")
        tcAll.withColumn("__tot", sum(col("__c")).over(wTok))
          .where(col("__tot") >= minCount.toDouble).drop("__tot")
      }).localCheckpoint(true)
    val vocab = tc.select(col("tok")).distinct().count().toDouble
    require(vocab > 0,
      "cannot train Naive Bayes: corpus is empty or has no labeled rows")
    // class-count-sized frames (collectable by the centroid contract);
    // token counts are integers < 2^53 so the double sums are exact
    val nToks = tc.groupBy("cls").agg(sum(col("__c")).as("n")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val docCounts = labeled.groupBy("cls").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val totalDocs = docCounts.map(_._2).sum.toDouble
    val classes = docCounts.sortBy(_._1).toSeq.map { case (c, n) =>
      val denom = nToks.getOrElse(c, 0.0) + vocab
      NaiveBayesClass(c, math.log(n.toDouble / totalDocs),
        math.log(1.0 / denom))
    }
    val denomByCls = map(classes.flatMap(c =>
      Seq(lit(c.cls), lit(nToks.getOrElse(c.cls, 0.0) + vocab))): _*)
    val model = tc.select(col("tok"), col("cls"),
      log((col("__c") + lit(1.0)) / element_at(denomByCls, col("cls")))
        .as("logp"))
    NaiveBayesModel(model, classes)
  }

  /** Per-(document, class) Naive Bayes log-scores:
    * `score = ln prior(c) + Σ_tok ln P(tok|c)` with the model's OOV
    * floor for tokens unseen under that class. Map-side shape: explode
    * tokens, fan out over the (small) class list, broadcast-join the
    * vocabulary-sized model, partial-aggregated groupBy — no corpus
    * rescan and no driver data. The token-term sum goes through exact
    * decimal summation (the [[perplexity]] discipline) so scores are
    * partition-order independent. Documents whose text is null emit no
    * tokens and drop.
    */
  def nbScore(docs: DataFrame, idCol: String, textCol: String,
      model: NaiveBayesModel): DataFrame = {
    require(model.classes.nonEmpty, "Naive Bayes model has no classes")
    val clsArr = array(model.classes.map(c =>
      struct(lit(c.cls).as("cls"), lit(c.logPrior).as("log_prior"),
        lit(c.oovLogp).as("oov_logp"))): _*)
    // fanned out before tokenization (r15 — one-file scan = one task
    // for the whole tokenize + class fan + score phase; sums are exact)
    graft.operators.Fanout.fanOut(
        docs.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .select(col(idCol), col("tok"), explode(clsArr).as("__cl"))
      .select(col(idCol), col("tok"), col("__cl.cls").as("cls"),
        col("__cl.log_prior").as("__prior"), col("__cl.oov_logp").as("__oov"))
      .join(broadcast(model.tokenLogp), Seq("tok", "cls"), "left")
      .groupBy(col(idCol), col("cls"))
      .agg(
        (max(col("__prior")) + sum(coalesce(col("logp"), col("__oov"))
          .cast(DecimalType(28, 18))).cast(DoubleType)).as("score"),
        count(lit(1)).cast(IntegerType).as("n_tokens"))
  }

  /** Argmax classification over [[nbScore]]: one row per document with
    * the winning class and its score (ties break on class name so the
    * answer is engine-portable). The window partitions by document —
    * class-count-sized groups, never a scaling concern.
    */
  def nbClassify(docs: DataFrame, idCol: String, textCol: String,
      model: NaiveBayesModel): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("cls"))
    nbScore(docs, idCol, textCol, model)
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1)
      .select(col(idCol), col("cls").as("pred"), col("score"))
  }

  // ---- markup stripping (boilerplate removal for web-crawl text) ----

  /** HTML/markup → plain text as ONE chained column expression (no UDF,
    * fully codegen'd): script/style/comment BLOCKS go first (contents
    * and all — a tag-only strip would leak javascript into the corpus),
    * then remaining tags, then the five entities that appear in
    * attribute-escaped text (`&lt; &gt; &quot; &#39; &nbsp;` and LAST
    * `&amp;` — decoding it earlier would double-decode `&amp;lt;`),
    * then whitespace runs collapse to one space. Every regex is in the
    * Java-regex ∩ RE2 common subset (no backreferences) so the DuckDB
    * oracle runs the identical patterns.
    */
  def stripMarkup(html: Column): Column = {
    val noScript =
      regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (c, (from, to)) =>
        replace(c, lit(from), lit(to))
      }
    val amp = replace(decoded, lit("&amp;"), lit("&"))
    trim(regexp_replace(amp, "[ \\t\\n\\r]+", " "))
  }

  /** Count of markup tags in the raw html (pre-strip) — the audit
    * measure published next to the cleaned text. */
  def markupTagCount(html: Column): Column =
    regexp_count(html, lit("<[^>]+>")).cast(LongType)

  /** Per-document markup extraction: cleaned text + tag count + cleaned
    * length. Map-side only — one scan at any corpus size. */
  def markupStats(docs: DataFrame, idCol: String,
      htmlCol: String): DataFrame =
    docs.select(col(idCol),
      markupTagCount(col(htmlCol)).as("n_tags"),
      stripMarkup(col(htmlCol)).as("clean_text"))
      .withColumn("clean_len", length(col("clean_text")).cast(LongType))

  // ---- URL canonicalization (crawl dedup / per-domain stats) ----

  /** Canonical form of a URL: lowercase scheme and host, default port
    * stripped (:443 under https, :80 under http), tracking params
    * (`utm_*`) dropped, remaining query params sorted bytewise, fragment
    * removed, empty path normalized to `/`. Pure column expressions —
    * the regexes live in the Java ∩ RE2 subset and the param pipeline is
    * split → filter → array_sort → array_join, all of which DuckDB
    * mirrors (string_split / list_filter / list_sort /
    * array_to_string), so canonical forms are oracle-comparable.
    * Path and param VALUES keep their case (they are case-sensitive per
    * RFC 3986; only scheme+host are case-insensitive).
    */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val scheme = lower(
      regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = lower(
      regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .when(scheme === "http", regexp_replace(auth, ":80$", ""))
      .otherwise(auth)
    val rawPath = regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    val query = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val kept = array_join(
      array_sort(filter(split(query, "&"),
        p => p =!= "" && substring(p, 1, 4) =!= "utm_")), "&")
    concat(scheme, lit("://"), host, path,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  /** The lowercased host of a URL with any default port stripped (the
    * host part of [[canonicalUrl]]). */
  def urlHost(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val scheme = lower(
      regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = lower(
      regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .when(scheme === "http", regexp_replace(auth, ":80$", ""))
      .otherwise(auth)
  }

  /** Naive registered domain: the last two dot-labels of the host (no
    * public-suffix list in a zero-dependency engine — co.uk-style
    * suffixes group one level too coarse, documented contract; see
    * [[urlDomainPsl]] for the snapshot-backed form). */
  def urlDomain(url: Column): Column =
    regexp_extract(regexp_replace(urlHost(url), ":[0-9]+$", ""),
      "([^.:]+\\.[^.:]+)$", 1)

  /** Trimmed snapshot of the public suffix list (publicsuffix.org,
    * ICANN section — public data): the 2-label registry suffixes of
    * the highest-traffic ccTLDs. Under these, a registrable domain is
    * THREE labels (`shop.co.uk`), not two — the naive [[urlDomain]]
    * collapses every `*.co.uk` site into one key, which merges
    * unrelated domains in per-domain dedup/quality rollups. Trimmed =
    * 2-label entries only; deeper/wildcard PSL rules (e.g. the
    * `*.ck`-style wildcards and 3-label city registries) fall back to
    * the naive form — documented contract, replace the snapshot to
    * widen. Sorted, deduped; the oracle shares the literal list.
    */
  private[graft] val PublicSuffixes2: Seq[String] = Seq(
    "ac.il", "ac.in", "ac.jp", "ac.ke", "ac.kr", "ac.nz", "ac.th",
    "ac.uk", "ac.za", "ad.jp", "asn.au", "co.id", "co.il", "co.in",
    "co.jp", "co.ke", "co.kr", "co.nz", "co.th", "co.uk", "co.ve",
    "co.za", "com.ar", "com.au", "com.bd", "com.bo", "com.br",
    "com.cn", "com.co", "com.do", "com.ec", "com.eg", "com.gt",
    "com.hk", "com.hn", "com.mx", "com.my", "com.ng", "com.ni",
    "com.pa", "com.pe", "com.ph", "com.pk", "com.py", "com.sa",
    "com.sg", "com.sv", "com.tr", "com.tw", "com.ua", "com.uy",
    "com.ve", "com.vn", "ed.jp", "edu.ar", "edu.au", "edu.bd",
    "edu.br", "edu.cn", "edu.co", "edu.eg", "edu.hk", "edu.in",
    "edu.mx", "edu.my", "edu.ng", "edu.pk", "edu.ph", "edu.sa",
    "edu.sg", "edu.tr", "edu.ua", "edu.vn", "firm.in", "gen.in",
    "gen.nz", "gen.tr", "go.id", "go.jp", "go.ke", "go.kr", "go.th",
    "gob.ar", "gob.mx", "gob.pe", "gov.au", "gov.bd", "gov.br",
    "gov.cn", "gov.co", "gov.eg", "gov.hk", "gov.il", "gov.in",
    "gov.my", "gov.ng", "gov.ph", "gov.pk", "gov.sa", "gov.sg",
    "gov.tr", "gov.ua", "gov.uk", "gov.vn", "gov.za", "gr.jp",
    "id.au", "idv.hk", "idv.tw", "in.th", "in.ua", "ind.in",
    "lg.jp", "ltd.uk", "me.uk", "med.sa", "muni.il", "ne.jp",
    "ne.ke", "ne.kr", "net.ar", "net.au", "net.bd", "net.br",
    "net.cn", "net.co", "net.eg", "net.hk", "net.il", "net.in",
    "net.mx", "net.my", "net.ng", "net.nz", "net.pe", "net.ph",
    "net.pk", "net.sa", "net.sg", "net.tr", "net.tw", "net.ua",
    "net.uk", "net.vn", "net.za", "nic.in", "nom.co", "or.id",
    "or.jp", "or.ke", "or.kr", "or.th", "org.ar", "org.au",
    "org.bd", "org.br", "org.cn", "org.co", "org.eg", "org.hk",
    "org.il", "org.in", "org.mx", "org.my", "org.ng", "org.nz",
    "org.pe", "org.ph", "org.pk", "org.sa", "org.sg", "org.tr",
    "org.tw", "org.ua", "org.uk", "org.vn", "org.za", "pe.kr",
    "plc.uk", "re.kr", "res.in", "sc.ke", "sch.id", "sch.sa",
    "sch.uk", "web.id", "web.tr", "web.za")

  /** PSL-aware registered domain: when the host's last two labels are
    * a public suffix from the snapshot, the registrable domain is the
    * last THREE labels (`shop.co.uk`); otherwise the naive last-two
    * form. The membership test is a literal `isin` (compiles to a
    * Catalyst `InSet` hash probe — O(1) per row, codegen'd, map-side,
    * no join, no broadcast state to manage at 100 TB).
    */
  def urlDomainPsl(url: Column): Column = {
    val host = regexp_replace(urlHost(url), ":[0-9]+$", "")
    val labels = split(host, "\\.")
    val last2 = concat_ws(".", slice(labels, -2, 2))
    when(size(labels) >= 3 && last2.isin(PublicSuffixes2: _*),
      concat_ws(".", slice(labels, -3, 3)))
      .otherwise(regexp_extract(host, "([^.:]+\\.[^.:]+)$", 1))
  }

  /** Per-row URL normalization: canonical url + host + registered
    * domain. Map-side only. */
  def normalizeUrls(df: DataFrame, urlCol: String): DataFrame =
    df.withColumn("canon_url", canonicalUrl(col(urlCol)))
      .withColumn("host", urlHost(col(urlCol)))
      .withColumn("domain", urlDomain(col(urlCol)))

  // ---- sentence segmentation (chunking preprocessing) ----

  /** Split documents into sentences on terminator runs followed by
    * whitespace (`[.!?]+\s+` — RE2∩Java, no lookbehind, so the split
    * CONSUMES the terminator except on the final sentence; documented
    * contract, the downstream chunkers only need stable boundaries).
    * Emits (id, sentence_idx 1-based, sentence, n_chars), empty pieces
    * dropped. Map-side explode — one scan, no shuffle.
    */
  def sentences(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol),
        posexplode(split(col(textCol), "[.!?]+[ \\t\\n\\r]+"))
          .as(Seq("__i", "__s")))
      .select(col(idCol), (col("__i") + 1).as("sentence_idx"),
        trim(col("__s")).as("sentence"))
      .where(col("sentence") =!= "")
      .withColumn("n_chars", length(col("sentence")).cast(LongType))

  // ---- PII scrubbing (training-data redaction) ----

  /** The PII pattern table, ordered: (category, RE2∩Java regex,
    * replacement token). Order matters — the credit-card pattern must
    * fire before the generic digit runs it contains, the SSN shape
    * (3-2-4) before the phone shapes. All patterns avoid lookarounds
    * and backreferences so the oracle can run them verbatim.
    */
  private[graft] val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "<EMAIL>"),
    ("cc", "\\b[0-9]{4}([ -][0-9]{4}){3}\\b", "<CC>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<ID>"),
    ("phone", "\\+[0-9]{7,15}", "<PHONE>"),
    ("ip", "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b", "<IP>"))

  /** Replace every PII hit with its category token — one chained,
    * codegen'd `regexp_replace` pass, map-side. */
  def scrubPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (_, re, tok)) =>
      regexp_replace(c, re, tok)
    }

  /** Per-document PII report: scrubbed text plus a hit count per
    * category. Each category is counted on the text AFTER the previous
    * categories' replacements — exactly the hits [[scrubPii]] replaces,
    * so shapes that overlap across categories (`user@10.0.0.1` matches
    * both the email and IPv4 patterns) are attributed once, to the
    * first pattern in the chain, never double-counted. One scan, zero
    * shuffles.
    */
  def piiReport(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val (counted, scrubbed) = PiiPatterns.foldLeft(
      (docs.select(col(idCol), col(textCol)), col(textCol))) {
      case ((d, cur), (cat, re, tok)) =>
        (d.withColumn(s"n_$cat",
          regexp_count(cur, lit(re)).cast(LongType)),
          regexp_replace(cur, re, tok))
    }
    counted
      .withColumn("scrubbed", scrubbed)
      .withColumn("n_pii",
        PiiPatterns.map { case (cat, _, _) => col(s"n_$cat") }
          .reduce(_ + _))
      .drop(textCol)
  }
}
