package graft

import org.apache.spark.sql.SparkSession

class ExtensionsSpec extends SparkTestBase {

  test("GraftExtensions injects native functions into a session's SQL") {
    val old = spark // force base session creation first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        """SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
          |       graft_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
          |       graft_overlap(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS o,
          |       graft_simhash64(array(42L)) AS s,
          |       graft_ngram_hashes(array('a','b','c'), 2) AS ng
          |""".stripMargin).head
      assert(r.getDouble(0) === 1.0)
      assert(r.getDouble(1) === 0.5)
      assert(r.getDouble(2) === 2.0 / 3.0)
      assert(r.getLong(3) === 42L) // single hash: simhash == its bit pattern
      assert(r.getSeq[Long](4).length === 2)

      // image codecs round-trip through pure SQL
      val img = s2.sql(
        """SELECT graft_bmp_decode(graft_bmp_encode(3, 2, 10, false)) AS b,
          |       graft_png_decode(graft_png_encode(3, 2, 10)) AS p,
          |       graft_wav_decode(graft_wav_encode(2, 8000, 3, 5)) AS w
          |""".stripMargin).head
      val b = img.getStruct(0)
      assert(b.getInt(0) === 3 && b.getInt(1) === 2)
      assert(b.getLong(4) === 3L * 2 * 3 * 10) // solid-fill pixel sum
      val p = img.getStruct(1)
      assert(p.getInt(0) === 3 && p.getInt(1) === 2)
      // gradient sum: 3 * sum over (x,y) of (10+x+y)
      assert(p.getLong(2) ===
        3L * (for (x <- 0 until 3; y <- 0 until 2) yield 10 + x + y).sum)
      val w = img.getStruct(2)
      assert(w.getInt(0) === 2 && w.getInt(1) === 8000 && w.getInt(2) === 16)
      // ramp sum over 6 samples from seed 5
      assert(w.getLong(3) === 3L &&
        w.getLong(4) === (0 until 6).map(k => 5 + k - 32768L).sum)

      // the injected planner strategy plans AsOfJoinNode declaratively
      // (no experimental.extraStrategies registration in this session)
      assert(!s2.experimental.extraStrategies.contains(graft.plans.AsOfStrategy))
      import org.apache.spark.sql.GraftSqlShim
      import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast}
      import org.apache.spark.sql.types.{DoubleType, TimestampType}
      import s2.implicits._
      val lf = Seq((java.sql.Timestamp.valueOf("2024-05-01 01:00:00"), 1.0))
        .toDF("t", "x")
      val rf = Seq((java.sql.Timestamp.valueOf("2024-05-01 00:00:00"), 9.0))
        .toDF("t", "v")
      val lPlan = GraftSqlShim.analyzed(lf)
      val rPlan = GraftSqlShim.analyzed(rf)
      val node = graft.plans.AsOfJoinNode(lPlan, rPlan, Nil, Nil,
        Cast(lPlan.output.head, TimestampType, Some("UTC")),
        Cast(rPlan.output.head, TimestampType, Some("UTC")),
        Seq(rPlan.output(1)),
        Seq(AttributeReference("v", DoubleType)()), inner = false)
      val out = GraftSqlShim.ofRows(s2, node)
      assert(out.queryExecution.executedPlan.toString.contains("AsOfMergeJoin"))
      assert(out.select("v").head.getDouble(0) === 9.0)
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }
}
