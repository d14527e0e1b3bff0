package graft

import org.apache.spark.sql.functions._
import graft.functions.AhoCorasick

class AhoCorasickSpec extends SparkTestBase {
  import spark.implicits._

  private def counts(text: String, dict: Seq[String]): Seq[Long] =
    new AhoCorasick.Automaton(dict).count(text).toSeq

  test("overlapping and nested matches all count (the oracle contract)") {
    // self-overlap: "aa" ends at positions 2 and 3 of "aaa"
    assert(counts("aaa", Seq("aa")) === Seq(2L))
    // nesting: "a" and "and" both fire inside "and"
    assert(counts("and", Seq("a", "and")) === Seq(1L, 1L))
    // a suffix of one pattern is another pattern (dict suffix links):
    // "she" contains "he"
    assert(counts("ushers", Seq("he", "she", "his", "hers")) ===
      Seq(1L, 1L, 0L, 1L))
    // fail-link walk mid-pattern: after "ab" fails on 'c', restart
    // finds "bc" via the proper suffix
    assert(counts("abc", Seq("abd", "bc")) === Seq(0L, 1L))
  }

  test("matches the naive per-position scan on random text") {
    val rnd = new scala.util.Random(7)
    val dict = Seq("ab", "ba", "aab", "bba", "a", "abab")
    (1 to 50).foreach { _ =>
      val text = Seq.fill(40)(if (rnd.nextBoolean()) 'a' else 'b').mkString
      val naive = dict.map { p =>
        (0 to text.length - p.length)
          .count(i => text.regionMatches(i, p, 0, p.length)).toLong
      }
      assert(counts(text, dict) === naive, s"text=$text")
    }
  }

  test("guards: empty dictionary, empty pattern, duplicates rejected") {
    intercept[IllegalArgumentException] {
      new AhoCorasick.Automaton(Nil)
    }
    intercept[IllegalArgumentException] {
      new AhoCorasick.Automaton(Seq("a", ""))
    }
    intercept[IllegalArgumentException] {
      new AhoCorasick.Automaton(Seq("a", "b", "a"))
    }
  }

  test("column expression: per-pattern array in dictionary order, " +
      "null text yields null") {
    val dict = Seq("the", "cat")
    val df = Seq((1L, Some("the cat in the hat")), (2L, None))
      .toDF("id", "text")
    val got = df.select(col("id"),
        AhoCorasick.acCount(col("text"), dict).as("c"))
      .orderBy("id").collect()
    assert(got(0).getSeq[Long](1) === Seq(2L, 1L))
    assert(got(1).isNullAt(1))
  }

  test("find: 1-based start positions, overlaps and nests included, " +
      "consistent with count") {
    val auto = new AhoCorasick.Automaton(Seq("aa", "a", "and"))
    // "aaa": 'a' at 1,2,3; 'aa' at 1,2
    assert(auto.find("aaa").toSet ===
      Set((0, 1), (0, 2), (1, 1), (1, 2), (1, 3)))
    // "xandy": 'a' at 2, 'and' at 2
    assert(auto.find("xandy").toSet === Set((1, 2), (2, 2)))
    // find multiset sizes equal count
    val text = "a and aa banana and"
    val counts = auto.count(text)
    val byIdx = auto.find(text).groupBy(_._1).view.mapValues(_.size)
    (0 until 3).foreach { i =>
      assert(counts(i) === byIdx.getOrElse(i, 0).toLong, s"pattern $i")
    }
  }

  test("SQL registration: comma-joined dictionary literal") {
    graft.functions.GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_ac_count('the cat sat on the mat', 'the,at') AS c")
      .head().getSeq[Long](0)
    // 'the' twice; 'at' inside cat, sat, mat
    assert(got === Seq(2L, 3L))
  }
}
