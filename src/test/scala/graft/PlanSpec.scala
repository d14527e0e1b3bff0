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

  test("j2: auto() picks the zero-fact-shuffle broadcast as-of at this scale") {
    val p = plan("j2_asof")
    // grouped right side is tiny at test scale -> the broadcast pick: the
    // fact side is never exchanged, values come from a broadcast hash join
    assert(p.contains("BroadcastExchange"), s"right side not broadcast:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast pick:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // no window composition in the production default (that showcase shape
    // lives on in j3_asof_global); merge-strategy selection is covered by
    // AsOfJoinSpec's auto() tests
    assert(!p.contains("windowspecdefinition(user_id"),
      s"auto() fell back to the window composition:\n$p")
  }

  test("q5: cyclic 6-way join plans hash joins with broadcast dims and " +
      "pushed date bounds") {
    val p = plan("q5_region_revenue")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), s"nested loop in q5:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dims not broadcast:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), " +
      "GreaterThanOrEqual(o_orderdate"), s"date bounds not pushed:\n$p")
    assert(p.contains("partial_sum"), s"no map-side combine:\n$p")
  }

  test("q13: zero-order customers survive the left outer join") {
    val p = plan("q13_order_distribution")
    assert(p.contains("LeftOuter"), s"expected left outer join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"))
  }

  test("a6: single-pass global aggregate (one scan, no joins)") {
    val p = plan("a6_pct_distribution")
    assert(!p.contains("Join"), s"pct distribution should be one agg:\n$p")
    assert(p.contains("partial_sum"))
  }

  test("z1: z-value scan reads only the three needed columns") {
    val p = plan("z1_zorder")
    // don't pin the ts parquet encoding (it has drifted nanos-long →
    // timestamp_ntz once already) — just assert 3-column pruning
    val read = "ReadSchema: struct<event_id:bigint,ts:[a-z_]+,user_id:bigint>".r
    assert(read.findFirstIn(p).isDefined,
      s"columns not pruned to (event_id, ts, user_id):\n$p")
    assert(!p.contains("Exchange") || p.contains("rangepartitioning"),
      s"map-side z computation should only exchange for the sort:\n$p")
  }

  test("g1: gap-fill bounds join is broadcast (no fact-side shuffle for it)") {
    val p = plan("g1_gapfill")
    assert(p.contains("BroadcastHashJoin"), s"bounds not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("sim4: fused quantize roundtrip leaves no HOF in the plan") {
    val p = plan("sim4_quantized_topk")
    assert(p.contains("graft_quantize_roundtrip"),
      s"fused expression missing:\n$p")
    // the old HOF composition materialized the quantize struct
    // (mn/scale/codes) and walked it with two transforms; the only
    // lambda left is the 5-row query side's double cast
    assert(!p.contains("codes"),
      s"HOF quantize struct survived in the hot path:\n$p")
  }

  test("t12: repetition stats stay map-side (no shuffle before the sort)") {
    val p = plan("t12_repetition")
    // exactly the ORDER BY exchange; the stats themselves add none
    val exchanges = "Exchange".r.findAllIn(
      p.split("== Initial Plan ==").head).length
    assert(exchanges <= 1, s"repetition stats should not shuffle:\n$p")
  }
}
