package graft

/** Plan-quality guards: these assert the *shape* of the physical plans the
  * optimizer produces, because at 100 TB the plan is the performance.
  */
class PlanSpec extends SparkTestBase {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("s1: filter and projection reach the parquet scan") {
    val p = plan("s1_scan_prune")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"),
      s"filter not pushed:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_shipdate"),
      s"columns not pruned:\n$p")
  }

  test("j1: interval join extracts equi key — hash join, no nested loop") {
    val p = plan("j1_interval")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    assert(p.contains("HashJoin"), s"expected hash join:\n$p")
  }

  test("q1: aggregation has map-side partial (partial_sum before shuffle)") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum"), s"no map-side combine:\n$p")
  }

  test("j2: as-of uses one hash shuffle on (keys, bucket) + broadcast carry") {
    val p = plan("j2_asof")
    assert(p.contains("BroadcastExchange"), s"carry-in spine not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // exactly one window pass over the big (union) side
    assert("windowspecdefinition\\(user_id".r.findAllIn(p).size >= 1)
  }

  test("a6: single-pass global aggregate (one scan, no joins)") {
    val p = plan("a6_pct_distribution")
    assert(!p.contains("Join"), s"pct distribution should be one agg:\n$p")
    assert(p.contains("partial_sum"))
  }
}
