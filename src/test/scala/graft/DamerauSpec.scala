package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Unrestricted Damerau–Levenshtein: Lowrance–Wagner fixpoints that
  * separate it from both plain Levenshtein and the restricted/OSA
  * variant, metric properties on random strings, and the edge/null/cap
  * contract.
  */
class DamerauSpec extends SparkTestBase {
  import spark.implicits._

  private def dl(a: String, b: String): Option[Int] = {
    val r = Seq((a, b)).toDF("a", "b")
      .select(GraftFunctions.damerau(col("a"), col("b")).as("d"))
      .collect().head
    if (r.isNullAt(0)) None else Some(r.getInt(0))
  }

  test("known distances, including the unrestricted-variant separator") {
    // DL("CA","ABC") = 2 distinguishes unrestricted (CA→AC→ABC) from
    // OSA (which forbids editing a transposed pair and says 3) — and is
    // what DuckDB's damerau_levenshtein returns (probed).
    assert(dl("CA", "ABC") === Some(2))
    assert(dl("ab", "ba") === Some(1))
    assert(dl("abcdef", "abcfad") === Some(3))
    assert(dl("kitten", "sitting") === Some(3))
    assert(dl("recieve", "receive") === Some(1), "the common-typo class")
    assert(dl("same", "same") === Some(0))
    assert(dl("", "abc") === Some(3))
    assert(dl("abc", "") === Some(3))
    assert(dl("", "") === Some(0))
  }

  test("DL is bounded above by Levenshtein and below by length delta") {
    val rnd = new scala.util.Random(42)
    def word() = (0 until (1 + rnd.nextInt(12)))
      .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val pairs = Seq.fill(200)((word(), word()))
    val rows = pairs.toDF("a", "b")
      .select(GraftFunctions.damerau(col("a"), col("b")).as("d"),
        levenshtein(col("a"), col("b")).as("lev"),
        abs(length(col("a")) - length(col("b"))).as("delta"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(0) <= r.getInt(1), s"DL > lev on $r")
      assert(r.getInt(0) >= r.getInt(2), s"DL < |len delta| on $r")
    }
  }

  test("symmetry and triangle inequality on random triples") {
    val rnd = new scala.util.Random(7)
    def word() = (0 until (1 + rnd.nextInt(8)))
      .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    for (_ <- 1 to 100) {
      val (x, y, z) = (word(), word(), word())
      val (dxy, dyx) = (dl(x, y).get, dl(y, x).get)
      assert(dxy === dyx, s"asymmetric on ($x,$y)")
      assert(dxy <= dl(x, z).get + dl(z, y).get,
        s"triangle violated on ($x,$y,$z)")
    }
  }

  test("nulls propagate; over-cap inputs return null, not OOM") {
    val rows = Seq(
      (1, null.asInstanceOf[String], "x"),
      (2, "x", null.asInstanceOf[String]),
      (3, "y" * (GraftFunctions.DamerauLevenshtein.MaxLen + 1), "x"))
      .toDF("id", "a", "b")
      .select(col("id"), GraftFunctions.damerau(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(rows.forall(_.isNullAt(1)))
    // exactly at the cap still computes
    assert(dl("y" * 64, "y" * 64) === Some(0))
  }

  test("kernel survives codegen and interpreted paths identically") {
    val df = Seq.tabulate(40)(i => (s"abc${i}xy", s"ab${i}cyx"))
      .toDF("a", "b")
    val a = df.select(sum(GraftFunctions.damerau(col("a"), col("b"))))
      .collect()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val b = df.select(sum(GraftFunctions.damerau(col("a"), col("b"))))
        .collect()
      assert(a.toSeq === b.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("SQL surface graft_damerau is registered") {
    GraftFunctions.register(spark)
    val out = spark.sql("SELECT graft_damerau('CA', 'ABC') AS d").collect()
    assert(out.head.getInt(0) === 2)
  }
}
