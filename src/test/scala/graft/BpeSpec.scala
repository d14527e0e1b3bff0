package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.operators.TextAnalysis

/** BPE subword tokenization: merge-table training over the distributed
  * word-frequency frame + the native greedy encode expression.
  */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private def enc(text: String, merges: Seq[(String, String)]): Seq[String] =
    Seq(text).toDF("t")
      .select(GraftFunctions.bpeEncode(col("t"), merges).as("s"))
      .head.getSeq[String](0)

  test("empty merge table degenerates to code-point symbols per word") {
    assert(enc("ab cd", Nil) === Seq("a", "b", "c", "d"))
    assert(enc("  spaced   out  ", Nil) ===
      "spacedout".map(_.toString).toSeq)
    assert(enc("", Nil) === Seq.empty)
    assert(enc("   ", Nil) === Seq.empty)
  }

  test("supplementary code points split as single symbols") {
    // U+1D11E (musical G clef) is a surrogate pair in UTF-16
    val g = new String(Character.toChars(0x1D11E))
    assert(enc(s"a${g}b", Nil) === Seq("a", g, "b"))
  }

  test("greedy lowest-rank merge, all occurrences left to right") {
    // rank 0 merges first even when a later pair appears earlier in
    // the word; repeated pairs all merge in one round
    val merges = Seq(("b", "c"), ("a", "bc"))
    assert(enc("abc", merges) === Seq("abc"))
    assert(enc("bcbc", merges) === Seq("bc", "bc"))
    // overlapping run: "aaa" with (a,a) merges the LEFT pair first
    assert(enc("aaa", Seq(("a", "a"))) === Seq("aa", "a"))
    assert(enc("aaaa", Seq(("a", "a"), ("aa", "aa"))) === Seq("aaaa"))
  }

  test("null text encodes to null") {
    val r = Seq((1L, null: String)).toDF("id", "t")
      .select(GraftFunctions.bpeEncode(col("t"), Nil).as("s"))
      .head
    assert(r.isNullAt(0))
  }

  test("trainBpe learns the classic corpus merges") {
    // Sennrich-style toy corpus: "low" x5, "lower" x2, "newest" x6,
    // "widest" x3. Pair counts round 1: (e,s)=9, (s,t)=9, (w,e)=8 ...
    // lexicographic tiebreak picks (e,s) over (s,t); round 2 merges
    // (es,t)=9; round 3 (l,o)=7.
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .toDF("text")
    val merges = TextAnalysis.trainBpe(corpus, "text", numMerges = 3)
    assert(merges === Seq(("e", "s"), ("es", "t"), ("l", "o")))
    assert(enc("newest", merges) === Seq("n", "e", "w", "est"))
    assert(enc("lowest", merges) === Seq("lo", "w", "est"))
  }

  test("trainBpe stops early below minPairCount") {
    val corpus = Seq("ab", "ab", "cd").toDF("text")
    // (a,b)=2 meets the default minPairCount=2; (c,d)=1 does not
    val merges = TextAnalysis.trainBpe(corpus, "text", numMerges = 10)
    assert(merges === Seq(("a", "b")))
  }

  test("local and distributed trainers learn identical merges") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(40)
    val local = TextAnalysis.trainBpe(docs, "text", numMerges = 6)
    val dist = TextAnalysis.trainBpe(docs, "text", numMerges = 6,
      maxLocalVocab = 0L)
    assert(local === dist)
  }

  test("encode is stable under repartitioning") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val merges = TextAnalysis.trainBpe(docs, "text", numMerges = 8)
    val a = docs.select(col("doc_id"),
      GraftFunctions.bpeEncode(col("text"), merges).as("s"))
      .orderBy("doc_id").collect()
    val b = docs.repartition(7).select(col("doc_id"),
      GraftFunctions.bpeEncode(col("text"), merges).as("s"))
      .orderBy("doc_id").collect()
    assert(a === b)
  }
}
