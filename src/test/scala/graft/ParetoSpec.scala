package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** Per-group 2D Pareto frontier: the sort-sweep must equal the
  * brute-force dominance definition, collapse duplicates, and exclude
  * nulls.
  */
class ParetoSpec extends SparkTestBase {
  import spark.implicits._

  /** Brute-force skyline over distinct pairs: p survives iff no q with
    * q.x >= p.x, q.y >= p.y and at least one strict.
    */
  private def brute(points: Seq[(Int, Int)]): Set[(Int, Int)] = {
    val d = points.distinct
    d.filter(p => !d.exists(q =>
      q._1 >= p._1 && q._2 >= p._2 && (q._1 > p._1 || q._2 > p._2))).toSet
  }

  test("known frontier: staircase survives, interior points fall") {
    val pts = Seq((1, 5), (2, 4), (3, 3), (4, 2), (5, 1), // staircase
      (2, 2), (1, 1), (3, 1), // dominated interior
      (5, 1)) // duplicate of a frontier point
    val df = pts.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val got = Analytics.paretoFrontier2D(df, Seq("g"), "x", "y")
      .select("x", "y").collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(got.toSet === Set((1, 5), (2, 4), (3, 3), (4, 2), (5, 1)))
    assert(got.length === 5, "duplicates collapse to one frontier row")
  }

  test("matches brute force on random groups") {
    val rnd = new scala.util.Random(11)
    val pts = for {
      g <- Seq("a", "b", "c")
      _ <- 1 to 120
    } yield (g, rnd.nextInt(30), rnd.nextInt(30))
    val df = pts.toDF("g", "x", "y")
    val got = Analytics.paretoFrontier2D(df, Seq("g"), "x", "y")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
      .groupBy(_._1).view.mapValues(_.map(p => (p._2, p._3)).toSet).toMap
    Seq("a", "b", "c").foreach { g =>
      val want = brute(pts.filter(_._1 == g).map(p => (p._2, p._3)))
      assert(got(g) === want, s"group $g")
    }
  }

  test("groups are independent and nulls are excluded") {
    val df = Seq[(String, java.lang.Integer, java.lang.Integer)](
      ("a", 1, 1), ("b", 9, 9),
      ("a", null, 5), ("a", 5, null))
      .toDF("g", "x", "y")
    val got = Analytics.paretoFrontier2D(df, Seq("g"), "x", "y")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    // (a,1,1) survives in its own group despite b's dominating point;
    // null coordinates never enter the frontier
    assert(got.toSet === Set(("a", 1, 1), ("b", 9, 9)))
  }

  test("the sweep is partitioned per group, not a global window") {
    val df = Seq(("a", 1, 1), ("b", 2, 2)).toDF("g", "x", "y")
    val plan = Analytics.paretoFrontier2D(df, Seq("g"), "x", "y")
      .queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(g"),
      s"window must carry the group partition spec:\n$plan")
  }
}
