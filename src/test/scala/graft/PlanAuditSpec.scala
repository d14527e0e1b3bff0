package graft

/** Global plan-quality gate: every SparkEntry query's physical plan is
  * audited for accidental nested-loop / cartesian joins — the failure
  * mode that turns a 100 TB query into an N² disaster. Queries that
  * intentionally broadcast a tiny side against the full corpus (brute
  * force ANN baselines, the explicit cross-join op, 1-row global-agg
  * broadcasts) are allowlisted by name.
  */
class PlanAuditSpec extends SparkTestBase {

  // intentional cross/broadcast-nested-loop shapes:
  //  - a13_cross: the cross-join operator itself
  //  - sim1/sim4/sim5: brute-force / whole-corpus re-rank baselines
  //    broadcasting a tiny query set
  //  - t10/t21/a27: broadcast a single-row aggregate (corpus size /
  //    merged sketch)
  //  - a30_theta: 1-row x 1-row broadcast pairing of two group sketches
  //    for the set-algebra demo
  //  - q11: the q11 shape IS a group HAVING against a broadcast 1-row
  //    global scalar
  //  - sim14_mmr: the relevance pool comes from the sim1 brute-force
  //    baseline (tiny query set broadcast against the corpus)
  //  - t31_pmi: two 1-row total-count frames (unigrams, bigrams)
  //    broadcast-crossed into the pair frame
  //  - sim15/sim16/sim17: the binary-Hamming / recall-eval / matryoshka
  //    retrieval paths score the corpus against a broadcast tiny query
  //    set (the sim1 baseline shape; candidates bound the re-rank)
  //  - dq3_key_skew: per-key counts crossed with the broadcast 1-ROW
  //    global-stats frame (total, n_keys)
  //  - s14_negatives: anchors crossed with the broadcast 1-ROW corpus
  //    count (N) to compute probe positions; the draw itself is an
  //    equi-join on position
  //  - ds3_loo_influence: per-group sums crossed with the broadcast
  //    1-ROW grand-total frame
  //  - a43_chi2_cells: contingency CELLS (not rows) crossed with the
  //    broadcast 1-ROW grand-total N
  //  - a44_kendall: strict (>) self-join over contingency CELLS and
  //    marginal values — |X|·|Y| rows, never the table — plus 1-row
  //    total frames crossed together
  private val allowed = Set(
    "a13_cross", "sim1_cosine_topk", "sim4_quantized_topk",
    "sim5_pq_topk", "sim5b_pq_exact", "sim7_pq_adc", "sim7b_adc_exact",
    "t10_tfidf", "t21_chi2", "a27_cm_rollup", "a30_theta",
    "q11_important_values", "sim14_mmr", "t31_pmi",
    "sim15_binary_topk", "sim16_recall", "sim17_matryoshka",
    "dq3_key_skew", "s14_negatives", "ds3_loo_influence",
    "a43_chi2_cells", "a44_kendall",
    // a45: the a44 cell-pair frame plus 1-row slope/total broadcasts
    "a45_theil_sen",
    // a46: nine digit rows crossed with the broadcast 1-ROW total
    "a46_benford",
    // dq5: base counts crossed with the broadcast 1-ROW orphan counts
    "dq5_fk_orphans",
    // sim19: both rankings are the sim1 brute-force shape (tiny query
    // set broadcast against the corpus)
    "sim19_ndcg",
    // a53: B bin rows crossed with the broadcast 1-ROW (N, Σ|gap|)
    // ECE frame
    "a53_calibration",
    // a54: the a43 cell frame (chi2Cells' broadcast 1-ROW grand total)
    "a54_cramers_v",
    // a55: the 1-ROW (n, agree) total crossed with the 1-ROW Σrt·ct
    "a55_kappa",
    // t38: the slice-pair grid is a ~|slices|² inequality join over the
    // tiny per-slice totals frame (languages, not rows)
    "t38_js_divergence",
    // g11: surviving pairs crossed with the broadcast 1-ROW basket
    // total for the lift denominator
    "g11_copurchase",
    // s15: the |strata|-row quota frame crossed with the 1-ROW total
    // and 1-ROW seat-sum frames (allocation algebra, never data rows)
    "s15_apportion",
    // s18: the same Hamilton allocation algebra over Neyman weights
    "s18_neyman",
    // a61: B bin rows crossed with the broadcast 1-ROW global totals
    // (N, positives, Σsq) for the Murphy decomposition
    "a61_brier",
    // t41: the t31 shape — the 1-ROW bigram total broadcast-crossed
    // into the pair frame
    "t41_llr",
    // dq7: boundary candidates crossed with the broadcast 1-ROW
    // (min, max) bounds frame
    "dq7_id_gaps",
    // a65: test rows crossed with the broadcast 1-ROW conformal
    // quantile q
    "a65_conformal",
    // sql8: a65's SQL surface — the same broadcast 1-ROW quantile cross
    "sql8_conformal",
    // a66: units crossed with the broadcast 1-ROW (theta, xbar) frame
    "a66_cuped",
    // sim21: |groups|² inequality join over per-LANGUAGE centroids
    // (groups, never rows — the t38 class)
    "sim21_domain_map",
    // ts23: |cohorts| x |global event times| broadcast grid (groups and
    // distinct churn days, never subjects)
    "ts23_logrank")

  test("no query plans a nested-loop or cartesian join unintentionally") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if !allowed(name) =>
        val plan =
          try fn(spark, sf).queryExecution.executedPlan.toString
          catch { case e: Throwable => s"PLANNING FAILED: $e" }
        if (plan.contains("BroadcastNestedLoopJoin") ||
          plan.contains("CartesianProduct") ||
          plan.startsWith("PLANNING FAILED"))
          Some(name -> plan.linesIterator.take(3).mkString(" | "))
        else None
      case _ => None
    }
    assert(offenders.isEmpty,
      s"unexpected nested-loop/cartesian plans:\n${offenders.mkString("\n")}")
  }
}
