package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
/** Graph analytics over pair frames (the edge lists the dedup /
  * similarity operators already produce) — the second family beside
  * [[Dedup.connectedComponents]]: components say WHICH records belong
  * together; centrality says which records MATTER in the link
  * structure (hub documents in a near-dup graph, canonical entities in
  * a linkage graph — the web-graph quality signal of a training-data
  * pipeline).
  *
  * Everything here is INTEGER-SCALED: ranks live in units of
  * `Scale` = 1e9 (nano-ranks) and every update is integer
  * multiply/floor-divide/sum — exact, associative, and therefore
  * bit-identical across engines, partitionings, and re-runs. A
  * floating-point PageRank cannot be oracled (per-group double sums
  * drift by fold order); this one hash-matches a DuckDB re-derivation.
  */
object Graph {

  /** Rank unit: 1.0 of classic PageRank == 1e9 nano-ranks. */
  val Scale: Long = 1000000000L

  /** Deterministic damped PageRank over an UNDIRECTED pair frame, a
    * fixed number of iterations:
    *
    *   r₀(v)    = Scale
    *   rₖ₊₁(v) = ⌊(1−d)·Scale⌋ + Σ_{u ~ v} ⌊⌊d_num·rₖ(u) / d_den⌋ / deg(u)⌋
    *
    * with damping d = `dampNum`/`dampDen` (default 85/100). Fixed
    * iteration count + integer floors = a pure function of the edge
    * set: no convergence test, no float drift. Vertices with no edges
    * keep the base mass ⌊(1−d)·Scale⌋ + their start surplus never
    * spreads (dangling mass is dropped, not redistributed — documented
    * difference from the stochastic-matrix formulation; fine for
    * CENTRALITY RANKING, which only needs the relative order).
    *
    * Overflow headroom: rₖ(u) ≤ |V|·Scale (mass never grows), so
    * d_num·rₖ(u) needs |V| ≲ 10⁸ at the default damping — beyond
    * that, lower `Scale`.
    *
    * Scale shape: per iteration, ONE shuffle of the edge frame joined
    * to the rank frame (hash on vertex id) + one sum by destination —
    * the standard distributed power iteration; `iterations` is fixed
    * and small. Edge and rank frames are re-derived per iteration from
    * cached inputs (constant lineage depth).
    *
    * @param pairs   undirected pair frame (each row = one edge; both
    *                directions are derived here, self-pairs dropped)
    * @return (idCol, rank) — nano-rank longs, one row per vertex
    */
  def pageRank(vertices: DataFrame, pairs: DataFrame, idCol: String,
      idCol2: String, iterations: Int = 3,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    require(dampNum > 0 && dampDen > 0 && dampNum < dampDen,
      s"damping must be in (0, 1), got $dampNum/$dampDen")
    val base = (dampDen - dampNum) * Scale / dampDen // ⌊(1−d)·Scale⌋
    // materialize the (possibly expensive) pair pipeline and the vertex
    // set ONCE — the power iteration references both every round, and
    // an un-checkpointed plan would re-derive them per reference (the
    // connectedComponents discipline)
    val ids = vertices.select(col(idCol).as("__v")).distinct()
      .localCheckpoint(true)
    // ids keep their native type (string doc ids work like numeric
    // keys) — a cast here would null non-numeric ids and silently
    // drop every edge
    val sym = pairs
      .select(col(idCol).as("__src"), col(idCol2).as("__dst"))
      .unionAll(pairs.select(col(idCol2).as("__src"),
        col(idCol).as("__dst")))
      .where(col("__src") =!= col("__dst")) // after the union: BOTH sides
      .distinct()
      .localCheckpoint(true)
    val deg = sym.groupBy(col("__src")).agg(count(lit(1)).as("__deg"))
    var ranks = ids.select(col("__v"), lit(Scale).as("__r"))
    var i = 0
    while (i < iterations) {
      val contrib = sym
        .join(ranks, col("__src") === col("__v"))
        .join(deg, "__src")
        .select(col("__dst"),
          expr(s"((__r * $dampNum) div $dampDen) div __deg")
            .as("__c"))
        .groupBy(col("__dst")).agg(sum(col("__c")).as("__in"))
      ranks = ids
        .join(contrib, col("__v") === col("__dst"), "left_outer")
        .select(col("__v"),
          (lit(base) + coalesce(col("__in"), lit(0L))).as("__r"))
      i += 1
      // bound the lineage: `ranks` otherwise re-plans through every
      // prior iteration's joins, and at iterations = 50 that is a
      // 50-join-deep plan the analyzer/optimizer chokes on. Integer
      // ranks are exact, so materializing changes nothing but the plan
      // (the connectedComponents discipline).
      if (i % 10 == 0 && i < iterations)
        ranks = ranks.localCheckpoint(true)
    }
    ranks.select(col("__v").as(idCol), col("__r").as("rank"))
  }

  /** Per-vertex triangle counts over an undirected pair frame — the
    * clustering-coefficient numerator (how CLIQUE-LIKE a record's
    * link neighborhood is: in a near-dup or linkage graph, high
    * triangle counts mark tight duplicate clusters, low counts mark
    * chainy false-positive bridges).
    *
    * Compact-forward / degree-ordered counting: orient every edge
    * from the endpoint that is smaller in the total order
    * (degree, id) to the larger; for a triangle {x ≺ y ≺ z} the
    * oriented edges are exactly x→y, x→z, y→z, so joining wedges
    * (x→y, x→z with y ≺ z) against the oriented edge set counts each
    * triangle ONCE, at its lowest-ordered vertex. The orientation is
    * the scale bound: out-degrees are O(√m), so a hub vertex's
    * wedge count never explodes the way naive neighbor-pairing does —
    * the join is edges ⋈ edges on the shared source + one (v,w)
    * edge-existence join, all hash-shuffled, nothing collected.
    *
    * Pure integer counting — exact, partition-independent, and
    * re-derivable in SQL (the oracle counts u<v<w id-ordered triples;
    * the triangle SET is orientation-invariant, so both formulations
    * agree). Returns (idCol, triangles) for vertices in ≥ 1 triangle.
    *
    * @param pairs undirected pair frame (one row per edge, either
    *              endpoint order; self-pairs dropped, duplicates
    *              collapse)
    */
  def triangleCounts(pairs: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val und = pairs
      .select(least(col(srcCol), col(dstCol)).as("__a"),
        greatest(col(srcCol), col(dstCol)).as("__b"))
      .where(col("__a") =!= col("__b") && col("__a").isNotNull)
      .distinct()
      .localCheckpoint(true) // derived once; reused for deg + 3 joins
    val deg = und.select(col("__a").as("__v"))
      .union(und.select(col("__b").as("__v")))
      .groupBy(col("__v")).agg(count(lit(1)).as("__dg"))
    // orient by the (degree, id) total order
    val before = (col("__da") < col("__db")) ||
      (col("__da") === col("__db") && col("__a") < col("__b"))
    val oriented = und
      .join(deg.select(col("__v").as("__a"), col("__dg").as("__da")), "__a")
      .join(deg.select(col("__v").as("__b"), col("__dg").as("__db")), "__b")
      .select(
        when(before, col("__a")).otherwise(col("__b")).as("__src"),
        when(before, col("__b")).otherwise(col("__a")).as("__dst"),
        when(before, col("__db")).otherwise(col("__da")).as("__ddg"))
      // three consumers (both wedge sides + the closing edge set):
      // materialize once or the und⋈deg⋈deg orientation re-plans 3×
      .localCheckpoint(true)
    val e1 = oriented.select(col("__src").as("__u"), col("__dst").as("__x"),
      col("__ddg").as("__xdg"))
    val e2 = oriented.select(col("__src").as("__u"), col("__dst").as("__y"),
      col("__ddg").as("__ydg"))
    val wedges = e1.join(e2, Seq("__u"))
      .where((col("__xdg") < col("__ydg")) ||
        (col("__xdg") === col("__ydg") && col("__x") < col("__y")))
    val closing = oriented
      .select(col("__src").as("__x"), col("__dst").as("__y"))
    val tri = wedges.join(closing, Seq("__x", "__y"))
      .select(col("__u"), col("__x"), col("__y"))
    tri.select(explode(array(col("__u"), col("__x"), col("__y")))
      .as("__v"))
      .groupBy(col("__v")).agg(count(lit(1)).as("triangles"))
      .select(col("__v").as(srcCol), col("triangles"))
  }

  /** TrustRank (Gyöngyi et al. 2004): [[pageRank]] with the teleport
    * mass restricted to a trusted SEED set — the standard "propagate
    * quality from vetted sources through the link structure" signal for
    * corpus curation (seeds = curated domains/documents; low TrustRank
    * far from any seed = likely spam/SEO content).
    *
    *   r₀(v)    = Scale·[v ∈ S]
    *   rₖ₊₁(v) = ⌊(1−d)·Scale⌋·[v ∈ S] + Σ_{u ~ v} ⌊⌊d_num·rₖ(u)/d_den⌋/deg(u)⌋
    *
    * Same integer-exact contract, per-iteration shape, and overflow
    * headroom as [[pageRank]] (which is the special case S = V).
    *
    * @param seeds single-column frame of trusted vertex ids (its FIRST
    *              column is read; extra rows not in `vertices` are
    *              ignored by the join)
    */
  def trustRank(vertices: DataFrame, pairs: DataFrame, idCol: String,
      idCol2: String, seeds: DataFrame, iterations: Int = 3,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    require(dampNum > 0 && dampDen > 0 && dampNum < dampDen,
      s"damping must be in (0, 1), got $dampNum/$dampDen")
    val base = (dampDen - dampNum) * Scale / dampDen
    val seedIds = seeds.select(col(seeds.columns.head).as("__v"))
      .distinct()
    // one frame carrying the seed flag — referenced every iteration
    val ids = vertices.select(col(idCol).as("__v")).distinct()
      .join(seedIds.select(col("__v"), lit(1L).as("__s")),
        Seq("__v"), "left_outer")
      .select(col("__v"), coalesce(col("__s"), lit(0L)).as("__seed"))
      .localCheckpoint(true)
    val sym = pairs
      .select(col(idCol).as("__src"), col(idCol2).as("__dst"))
      .unionAll(pairs.select(col(idCol2).as("__src"),
        col(idCol).as("__dst")))
      .where(col("__src") =!= col("__dst"))
      .distinct()
      .localCheckpoint(true)
    val deg = sym.groupBy(col("__src")).agg(count(lit(1)).as("__deg"))
    var ranks = ids.select(col("__v"), (col("__seed") * Scale).as("__r"))
    var i = 0
    while (i < iterations) {
      val contrib = sym
        .join(ranks, col("__src") === col("__v"))
        .join(deg, "__src")
        .select(col("__dst"),
          expr(s"((__r * $dampNum) div $dampDen) div __deg").as("__c"))
        .groupBy(col("__dst")).agg(sum(col("__c")).as("__in"))
      ranks = ids
        .join(contrib, col("__v") === col("__dst"), "left_outer")
        .select(col("__v"),
          (col("__seed") * base + coalesce(col("__in"), lit(0L)))
            .as("__r"))
      i += 1
      if (i % 10 == 0 && i < iterations)
        ranks = ranks.localCheckpoint(true)
    }
    ranks.select(col("__v").as(idCol), col("__r").as("rank"))
  }

  /** Multi-source BFS hop distance from a seed set, capped at `maxHops`
    * — [[trustRank]]'s structural sibling (how many links from any
    * vetted source is this record?), the standard spam-distance /
    * crawl-depth signal. Returns every vertex with its minimum hop
    * count to a seed, NULL when no seed is within `maxHops` — i.e. the
    * ≤-maxHops relaxation, a pure function of (edges, seeds, maxHops)
    * that an unrolled SQL re-derivation reproduces exactly.
    *
    * Scale shape: classic frontier BFS — each round joins ONLY the
    * newly-settled frontier (not the whole settled set) to the edge
    * frame, anti-joins out already-settled vertices, and stops early on
    * an empty frontier (one 1-long count action per round). Work is
    * O(edges touched per level), the same discipline as
    * [[Dedup.connectedComponents]]'s frontier variants.
    *
    * @param seeds single-column frame of seed vertex ids
    * @return (idCol, hops) — hops is NULL for unreached vertices
    */
  def seedDistance(vertices: DataFrame, pairs: DataFrame, idCol: String,
      idCol2: String, seeds: DataFrame, maxHops: Int = 8): DataFrame = {
    require(maxHops >= 1 && maxHops <= 64,
      s"maxHops must be in [1, 64], got $maxHops")
    val ids = vertices.select(col(idCol).as("__v")).distinct()
      .localCheckpoint(true)
    val sym = pairs
      .select(col(idCol).as("__src"), col(idCol2).as("__dst"))
      .unionAll(pairs.select(col(idCol2).as("__src"),
        col(idCol).as("__dst")))
      .where(col("__src") =!= col("__dst"))
      .distinct()
      .localCheckpoint(true)
    // seeds outside the vertex set must not leak into the output
    var settled = ids.join(
      seeds.select(col(seeds.columns.head).as("__v")).distinct(), "__v")
      .select(col("__v"), lit(0).as("__d"))
      .localCheckpoint(true)
    var frontier = settled
    var hop = 0
    var exhausted = false
    while (hop < maxHops && !exhausted) {
      hop += 1
      val next = sym
        .join(frontier, col("__src") === col("__v"))
        .select(col("__dst").as("__v")).distinct()
        .join(settled.select(col("__v")), Seq("__v"), "left_anti")
        .select(col("__v"), lit(hop).as("__d"))
        .localCheckpoint(true) // read 3×: emptiness, union, next frontier
      if (next.isEmpty) exhausted = true
      else {
        settled = settled.unionAll(next).localCheckpoint(true)
        frontier = next
      }
    }
    ids.join(settled, Seq("__v"), "left_outer")
      .select(col("__v").as(idCol), col("__d").as("hops"))
  }

  /** k-core: the maximal subgraph where every vertex has degree >= k —
    * the density filter for link graphs (a near-dup cluster's k-core is
    * its template heart; chainy false-positive bridges peel away). The
    * standard iterative peel: drop vertices with degree < k, recompute,
    * repeat until a fixpoint. Each round is one degree aggregation plus
    * two keep-list hash joins over the surviving edge frame (which only
    * shrinks); the fixpoint test is a 1-long count action per round.
    * Rounds are data-bounded (the graph's degeneracy peel depth), capped
    * by `maxRounds` — at the cap the PARTIAL peel is returned, still a
    * pure function of (edges, k, maxRounds), exact and oracle-able.
    *
    * Pure integer counting => hash-oracled against an unrolled SQL
    * re-derivation (extra unrolled rounds past the fixpoint are no-ops).
    *
    * @return (idCol, degree) for k-core members — degree WITHIN the core
    */
  def kCore(pairs: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int = 64): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1 && maxRounds <= 256,
      s"maxRounds must be in [1, 256], got $maxRounds")
    var edges = pairs
      .select(least(col(srcCol), col(dstCol)).as("__a"),
        greatest(col(srcCol), col(dstCol)).as("__b"))
      .where(col("__a") =!= col("__b") && col("__a").isNotNull)
      .distinct()
      .localCheckpoint(true)
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      val deg = edges.select(col("__a").as("__v"))
        .unionAll(edges.select(col("__b").as("__v")))
        .groupBy(col("__v")).agg(count(lit(1)).as("__dg"))
        .localCheckpoint(true) // read 3×: the fixpoint count + two joins
      if (deg.where(col("__dg") < k).isEmpty) done = true
      else {
        val keep = deg.where(col("__dg") >= k)
        edges = edges
          .join(keep.select(col("__v").as("__a")), "__a")
          .join(keep.select(col("__v").as("__b")), "__b")
          .select(col("__a"), col("__b"))
          .localCheckpoint(true)
        round += 1
      }
    }
    edges.select(col("__a").as("__v"))
      .unionAll(edges.select(col("__b").as("__v")))
      .groupBy(col("__v")).agg(count(lit(1)).as("degree"))
      .select(col("__v").as(srcCol), col("degree"))
  }

  /** Deterministic synchronous label propagation (Raghavan et al. 2007)
    * over an undirected pair frame — the lightweight community detector
    * beside [[Dedup.connectedComponents]]: components merge ANY linked
    * records; LPA splits a component into densely-linked communities
    * (template families inside one near-dup blob, entity sub-groups in
    * a linkage graph).
    *
    * Labels start as the vertex id. Each round, EVERY vertex with at
    * least one neighbor adopts the most frequent label among its
    * neighbors, ties broken by the SMALLEST label — a total order, so
    * a fixed iteration count makes the result a pure function of the
    * edge set (the async/random-order variant of the paper cannot be
    * oracled; this one hash-matches an unrolled SQL re-derivation).
    * Isolated vertices keep their own label.
    *
    * Scale shape: per iteration, one hash join of the edge frame to
    * the label frame + two partial-aggregated groupBys (count by
    * (dst, label), then argmax-by-struct per dst) — no windows, no
    * collects; the argmax is `min(struct(-count, label))`, a single
    * mergeable aggregate. Lineage is checkpointed every 10 rounds
    * (the [[pageRank]] discipline).
    *
    * @param pairs undirected pair frame (either endpoint order;
    *              self-pairs dropped, duplicates collapse)
    * @return (idCol, label) — one row per vertex
    */
  def labelPropagation(vertices: DataFrame, pairs: DataFrame,
      idCol: String, idCol2: String, iterations: Int = 4): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    val ids = vertices.select(col(idCol).as("__v")).distinct()
      .localCheckpoint(true)
    val sym = pairs
      .select(col(idCol).as("__src"), col(idCol2).as("__dst"))
      .unionAll(pairs.select(col(idCol2).as("__src"),
        col(idCol).as("__dst")))
      .where(col("__src") =!= col("__dst"))
      .distinct()
      .localCheckpoint(true)
    var labels = ids.select(col("__v"), col("__v").as("__lbl"))
    var i = 0
    while (i < iterations) {
      val freq = sym.join(labels, col("__src") === col("__v"))
        .groupBy(col("__dst"), col("__lbl"))
        .agg(count(lit(1)).as("__cnt"))
      // argmax by (count DESC, label ASC) as one mergeable aggregate
      val next = freq
        .select(col("__dst"),
          struct((-col("__cnt")).as("nc"), col("__lbl").as("l")).as("__s"))
        .groupBy(col("__dst")).agg(min(col("__s")).as("__m"))
        .select(col("__dst"), col("__m.l").as("__nl"))
      // labels has one row per vertex every round — no ids rejoin needed
      labels = labels
        .join(next, col("__v") === col("__dst"), "left_outer")
        .select(col("__v"), coalesce(col("__nl"), col("__lbl")).as("__lbl"))
      i += 1
      if (i % 10 == 0 && i < iterations)
        labels = labels.localCheckpoint(true)
    }
    labels.select(col("__v").as(idCol), col("__lbl").as("label"))
  }

  /** Local clustering coefficient: triangles(v) / C(deg(v), 2) — how
    * close each vertex's neighborhood is to a clique (1.0 = the
    * neighbors all know each other; the per-record "tight duplicate
    * cluster vs hub bridge" signal on a near-dup/linkage graph).
    * Degree-1 vertices have no wedge capacity and are skipped (the
    * coefficient is undefined); vertices in no triangle report 0.0.
    * One [[triangleCounts]] pass + the degree frame + a single exact
    * integer division per vertex (2T / d(d−1) — bitwise re-derivable).
    */
  def clusteringCoefficient(pairs: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    // pairs is often an expensive derivation (LSH / linkage); pin it
    // once — both the degree frame here and triangleCounts read it
    val p0 = pairs.localCheckpoint(true)
    val und = p0
      .select(least(col(srcCol), col(dstCol)).as("__a"),
        greatest(col(srcCol), col(dstCol)).as("__b"))
      .where(col("__a") =!= col("__b") && col("__a").isNotNull)
      .distinct()
    val deg = und.select(col("__a").as("__v"))
      .union(und.select(col("__b").as("__v")))
      .groupBy(col("__v")).agg(count(lit(1)).as("degree"))
    val tri = triangleCounts(p0, srcCol, dstCol)
      .withColumnRenamed(srcCol, "__tv")
    deg.where(col("degree") >= 2)
      .join(tri, col("__v") === col("__tv"), "left_outer")
      .select(col("__v").as(srcCol), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        ((coalesce(col("triangles"), lit(0L)) * lit(2L)).cast("double")
          / (col("degree") * (col("degree") - lit(1L))).cast("double"))
          .as("clustering_coeff"))
  }

  /** Canonical undirected edge set of a pair frame, its symmetric
    * directed expansion, and per-vertex degrees — the normalization
    * every whole-graph operator starts from, extracted so the
    * null/self-loop/duplicate policy can never silently diverge
    * between operators. `und` is localCheckpoint-pinned: callers read
    * it (and its derivatives) several times.
    */
  private def canonicalEdges(pairs: DataFrame, srcCol: String,
      dstCol: String): (DataFrame, DataFrame, DataFrame) = {
    val und = pairs
      .select(least(col(srcCol), col(dstCol)).as("__a"),
        greatest(col(srcCol), col(dstCol)).as("__b"))
      .where(col("__a") =!= col("__b") && col("__a").isNotNull)
      .distinct()
      .localCheckpoint(true)
    val sym = und.select(col("__a").as("__src"), col("__b").as("__dst"))
      .unionAll(und.select(col("__b").as("__src"),
        col("__a").as("__dst")))
    val deg = sym.groupBy(col("__src").as("__v"))
      .agg(count(lit(1)).as("__deg"))
    (und, sym, deg)
  }

  /** Hop-bounded harmonic centrality: per vertex, Σ_v 1/d(u,v) over
    * every vertex within `maxHops` — the centrality that stays defined
    * on DISCONNECTED graphs (unreachable pairs contribute 0, not ∞ like
    * closeness), i.e. exactly the hub score a near-dup/linkage graph
    * needs. Bounding the hops is what makes it computable at corpus
    * scale (Boldi & Vigna's harmonic, truncated): almost all of the
    * mass is in the first few hops, and the bound is the operator's
    * explicit scale knob.
    *
    * Exact BFS by iterated frontier joins over PAIR state: hop-k pairs
    * are the hop-(k−1) frontier joined one step, anti-joined against
    * every settled pair, so each (u,v) keeps its true shortest
    * distance. The settled state is the maxHops-hop closure — per-hop
    * fan-out is bounded by the degree distribution, and the default
    * maxHops = 3 keeps it |E|·avg-degree²-ish, the same budget as
    * [[linkPrediction]]'s wedge join one hop deeper.
    *
    * Determinism: distances and counts are exact integers; the score
    * folds the ≤ maxHops per-distance terms n_d/d (each one IEEE
    * division) through DECIMAL(38,18), fold-order free; round-6.
    */
  def harmonicCentrality(pairs: DataFrame, srcCol: String,
      dstCol: String, maxHops: Int = 3): DataFrame = {
    require(maxHops >= 1 && maxHops <= 8,
      s"maxHops must be in [1, 8], got $maxHops")
    val (_, sym0, _) = canonicalEdges(pairs, srcCol, dstCol)
    val sym = sym0.localCheckpoint(true) // the per-hop join side
    var settled = sym.select(col("__src").as("__u"),
      col("__dst").as("__v"), lit(1).as("__d")).localCheckpoint(true)
    var frontier = settled
    var hop = 1
    var exhausted = false
    while (hop < maxHops && !exhausted) {
      hop += 1
      val next = frontier.join(sym, col("__v") === col("__src"))
        .select(col("__u"), col("__dst").as("__w"))
        .where(col("__u") =!= col("__w"))
        .distinct()
        .join(settled.select(col("__u"), col("__v").as("__w")),
          Seq("__u", "__w"), "left_anti")
        .select(col("__u"), col("__w").as("__v"), lit(hop).as("__d"))
        .localCheckpoint(true) // read 3x: emptiness, union, next frontier
      if (next.isEmpty) exhausted = true
      else {
        settled = settled.unionAll(next).localCheckpoint(true)
        frontier = next
      }
    }
    val term = (col("__nd").cast(DoubleType) / col("__d").cast(DoubleType))
      .cast(DecimalType(38, 18))
    settled
      .groupBy(col("__u"), col("__d"))
      .agg(count(lit(1)).as("__nd"))
      .groupBy(col("__u").as(srcCol))
      .agg(sum(col("__nd")).as("n_reached"), sum(term).as("__h"))
      .select(col(srcCol), col("n_reached"),
        (round(col("__h").cast(DoubleType), 6) + lit(0.0)).as("harmonic"))
  }

  /** Degree assortativity — the Pearson correlation of endpoint
    * degrees over every (directed) edge (Newman 2002): r > 0 means
    * hubs link to hubs (social-graph shape), r < 0 means hubs link to
    * leaves (star/spam shape). THE one-number structural health check
    * of a linkage or near-dup graph, from one exact-moment pass over
    * the edge list.
    *
    * Determinism: degrees are exact counts; the five moments sum
    * degree products through DECIMAL(38,0) (overflow-proof, fold-order
    * free); r is the a16 fixed IEEE sequence, round-6.
    *
    * Scale shape: two hash joins of the symmetric edge list against
    * the degree frame + one global aggregate — no windows, nothing
    * quadratic.
    */
  def degreeAssortativity(pairs: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val (_, sym, deg) = canonicalEdges(pairs, srcCol, dstCol)
    val withDeg = sym
      .join(deg.select(col("__v").as("__src"), col("__deg").as("__da")),
        "__src")
      .join(deg.select(col("__v").as("__dst"), col("__deg").as("__db")),
        "__dst")
    val m = withDeg.agg(
      count(lit(1)).as("__n"),
      sum(col("__da").cast(d38)).cast(DoubleType).as("__sx"),
      sum(col("__db").cast(d38)).cast(DoubleType).as("__sy"),
      sum((col("__da").cast(d38) * col("__da").cast(d38)))
        .cast(DoubleType).as("__sxx"),
      sum((col("__db").cast(d38) * col("__db").cast(d38)))
        .cast(DoubleType).as("__syy"),
      sum((col("__da").cast(d38) * col("__db").cast(d38)))
        .cast(DoubleType).as("__sxy"))
    val (num, den) = Analytics.pearsonNumDen(
      col("__n").cast(DoubleType), col("__sx"), col("__sy"),
      col("__sxx"), col("__syy"), col("__sxy"))
    m.select(expr("__n div 2").as("n_edges"),
      (when(den > 0, round(num / den, 6) + lit(0.0))
        .otherwise(lit(null).cast(DoubleType))).as("assortativity"))
  }

  /** Link prediction over an undirected pair frame: scores every
    * NON-adjacent vertex pair that shares at least one neighbor with
    * the three classic neighborhood measures —
    *
    *   common_neighbors(u,w) = |N(u) ∩ N(w)|
    *   jaccard(u,w)          = |N(u) ∩ N(w)| / |N(u) ∪ N(w)|
    *   adamic_adar(u,w)      = Σ_{v ∈ N(u) ∩ N(w)} 1 / ln(deg(v))
    *
    * (Liben-Nowell & Kleinberg 2003). In a linkage/near-dup graph
    * these flag the record pairs the pairwise comparator MISSED but
    * the link structure implies — the standard "review next" queue.
    *
    * Determinism: common/union counts are exact integers; jaccard is
    * ONE integer division. Each Adamic–Adar term 1/ln(deg) is one
    * correctly-rounded double from an exact integer (deg(v) ≥ 2
    * always — v is adjacent to both u and w — so ln > 0), and terms
    * accumulate through DECIMAL(28,18) so the per-pair sum is
    * fold-order independent and re-derivable in SQL.
    *
    * Scale shape: the wedge join is edges ⋈ edges hash-shuffled on
    * the shared middle vertex — Σ_v deg(v)² candidate rows, the
    * inherent cost of neighborhood link prediction. A hub vertex of
    * degree d contributes d² wedges; `maxDegree` drops middles above
    * the cap BEFORE the join (the standard production bound — hubs
    * carry no signal: 1/ln(deg) → 0), keeping the fan-out
    * O(maxDegree · m). The existing-edge rejection is one anti join
    * on the canonical (min, max) pair key, no broadcast of either
    * side required.
    *
    * Cap semantics: ALL THREE measures count only common neighbors
    * with deg ≤ maxDegree, while the Jaccard denominator keeps the
    * FULL endpoint degrees — so when the cap actually drops a shared
    * hub, common_neighbors and jaccard are LOWER BOUNDS on the exact
    * values (never overestimates), and adamic_adar loses only terms
    * that were ≤ 1/ln(maxDegree) anyway. At the default cap the
    * measures are exact for any graph whose max degree stays under it.
    *
    * @param pairs     undirected pair frame (one row per edge, either
    *                  endpoint order; self-pairs dropped, duplicates
    *                  collapse)
    * @param maxDegree middle vertices with deg > maxDegree are
    *                  excluded from wedge generation (hub guard)
    * @return (srcCol, dstCol, common_neighbors, jaccard, adamic_adar)
    *         with srcCol < dstCol, for non-adjacent pairs with ≥ 1
    *         common neighbor
    */
  def linkPrediction(pairs: DataFrame, srcCol: String, dstCol: String,
      maxDegree: Int = 10000): DataFrame = {
    require(maxDegree >= 2, s"maxDegree must be >= 2, got $maxDegree")
    val (und, sym, deg) = canonicalEdges(pairs, srcCol, dstCol)
    // wedges through each middle vertex v: (u, w) with u < w, weighted
    // by v's Adamic–Adar contribution. The middle's degree rides along
    // so the weight is computed map-side, once per wedge.
    val mids = sym.join(deg.where(col("__deg") <= maxDegree),
        col("__src") === col("__v"))
      .select(col("__src").as("__mid"), col("__dst").as("__end"),
        col("__deg").as("__mdeg"))
    val wedges = mids.as("e1")
      .join(mids.as("e2"),
        col("e1.__mid") === col("e2.__mid") &&
          col("e1.__end") < col("e2.__end"))
      .select(col("e1.__end").as("__u"), col("e2.__end").as("__w"),
        (lit(1.0) / log(col("e1.__mdeg").cast("double")))
          .cast(DecimalType(28, 18)).as("__aa"))
    val scored = wedges
      .join(und, col("__u") === col("__a") && col("__w") === col("__b"),
        "left_anti")
      .groupBy(col("__u"), col("__w"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(col("__aa")).cast("double").as("__aad"))
    scored
      .join(deg.select(col("__v").as("__u"), col("__deg").as("__du")),
        "__u")
      .join(deg.select(col("__v").as("__w"), col("__deg").as("__dw")),
        "__w")
      .select(col("__u").as(srcCol), col("__w").as(dstCol),
        col("common_neighbors"),
        (col("common_neighbors").cast("double") /
          (col("__du") + col("__dw") - col("common_neighbors"))
            .cast("double") + lit(0.0)).as("jaccard"),
        (round(col("__aad"), 6) + lit(0.0)).as("adamic_adar"))
  }
}
