package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Integer-scaled PageRank: hand-computed fixtures, determinism, and
  * the degenerate shapes.
  */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private def ranksOf(vs: Seq[Long], es: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] =
    Graph.pageRank(vs.toDF("id"), es.toDF("id", "id2"),
      "id", "id2", iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("regular triangle is stationary at Scale; isolated vertex keeps base") {
    val r = ranksOf(Seq(1L, 2L, 3L, 4L), Seq((1L, 2L), (2L, 3L), (1L, 3L)), 3)
    assert(r(1L) === Graph.Scale && r(2L) === Graph.Scale &&
      r(3L) === Graph.Scale)
    assert(r(4L) === 150000000L) // ⌊0.15·Scale⌋ — no incoming mass
  }

  test("path graph matches the hand-computed two-iteration fixpoint") {
    // 1-2, 2-3: deg(1)=deg(3)=1, deg(2)=2; worked integer arithmetic
    val r1 = ranksOf(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 3L)), 1)
    assert(r1 === Map(1L -> 575000000L, 2L -> 1850000000L,
      3L -> 575000000L))
    val r2 = ranksOf(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 3L)), 2)
    assert(r2 === Map(1L -> 936250000L, 2L -> 1127500000L,
      3L -> 936250000L))
  }

  test("self-pairs and duplicate/reversed edges do not double-count") {
    val base = ranksOf(Seq(1L, 2L), Seq((1L, 2L)), 2)
    val noisy = ranksOf(Seq(1L, 2L),
      Seq((1L, 2L), (2L, 1L), (1L, 2L), (1L, 1L)), 2)
    assert(base === noisy)
  }

  test("ranks are invariant under repartitioning") {
    val vs = (1L to 200L).toDF("id").repartition(7)
    val es = (1L until 200L).map(i => (i, i + 1)).toDF("id", "id2")
      .repartition(5)
    val a = Graph.pageRank(vs, es, "id", "id2", 3)
      .orderBy("id").collect().map(_.getLong(1)).toSeq
    val b = Graph.pageRank(vs.repartition(3), es.repartition(11),
      "id", "id2", 3).orderBy("id").collect().map(_.getLong(1)).toSeq
    assert(a === b)
  }

  test("deep runs: 50 iterations on a non-trivial graph complete with " +
      "bounded lineage and are deterministic") {
    // 200 vertices, ring + chords — enough structure that ranks keep
    // moving for many rounds. Without the periodic localCheckpoint the
    // plan is a 50-join-deep lineage; this must finish promptly.
    val n = 200L
    val vs = (0L until n).toSeq
    val es = vs.map(i => (i, (i + 1) % n)) ++
      vs.filter(_ % 7 == 0).map(i => (i, (i + i / 7 + 3) % n))
    val a = ranksOf(vs, es, 50)
    val b = ranksOf(vs, es, 50)
    assert(a.size === n)
    assert(a === b)
    // mass is conserved up to floor loss: total <= |V| * Scale
    assert(a.values.sum <= n * Graph.Scale)
  }

  test("total mass never grows (dangling mass is dropped, not created)") {
    val vs = (1L to 50L).toDF("id")
    val es = (1L to 49L by 2).map(i => (i, i + 1)).toDF("id", "id2")
    val total = Graph.pageRank(vs, es, "id", "id2", 4)
      .agg(sum(col("rank"))).head.getLong(0)
    assert(total <= 50L * Graph.Scale)
  }

  private def triOf(es: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangleCounts(es.toDF("id", "id2"), "id", "id2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangles: K4 gives every vertex C(3,2)=3; square and star give none") {
    val k4 = triOf(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L)))
    assert(k4 === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(triOf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) === Map.empty)
    assert(triOf(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))) === Map.empty)
  }

  test("triangles: two triangles sharing an edge count per-vertex") {
    // {1,2,3} and {2,3,4}: vertices 2,3 are in both
    val r = triOf(Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(r === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("triangles: orientation, duplicates, and self-pairs are normalized") {
    val clean = triOf(Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    val noisy = triOf(Seq((2L, 1L), (1L, 2L), (3L, 1L), (2L, 3L),
      (3L, 2L), (1L, 1L)))
    assert(clean === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(noisy === clean)
  }

  test("clustering coefficient: K4 is all 1.0; wheel matches closed " +
      "forms; degree-1 vertices are skipped") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val cc = Graph.clusteringCoefficient(k4.toDF("id", "id2"),
      "id", "id2")
      .select("id", "degree", "triangles", "clustering_coeff")
      .as[(Long, Long, Long, Double)].collect()
    assert(cc.length === 4)
    assert(cc.forall(r => r._2 == 3L && r._3 == 3L && r._4 == 1.0))
    // wheel (hub 0, ring 1..8): hub coeff 2/(n-1), rim 2*2/(3*2)
    val n = 8L
    val wheel = (1L to n).map(i => (0L, i)) ++
      (1L to n).map(i => (i, i % n + 1))
    val wc = Graph.clusteringCoefficient(wheel.toDF("id", "id2"),
      "id", "id2")
      .select("id", "clustering_coeff").as[(Long, Double)]
      .collect().toMap
    assert(wc(0L) === 2.0 / (n - 1))
    assert((1L to n).forall(i => wc(i) === 2.0 / 3.0))
    // a pendant edge: degree-1 vertex has no row; its triangle-free
    // deg-2 neighbor reports 0.0
    val pend = Graph.clusteringCoefficient(
      Seq((1L, 2L), (2L, 3L)).toDF("id", "id2"), "id", "id2")
      .select("id", "clustering_coeff").as[(Long, Double)]
      .collect().toMap
    assert(pend === Map(2L -> 0.0))
  }

  test("triangles: hub graph counts match the closed form and " +
      "repartitioning does not change them") {
    // wheel graph: hub 0 + ring 1..n — every ring edge forms one
    // triangle with the hub: hub n triangles, each rim vertex 2
    val n = 24L
    val es = (1L to n).map(i => (0L, i)) ++
      (1L to n).map(i => (i, i % n + 1))
    val expected = ((1L to n).map(_ -> 2L) :+ (0L -> n)).toMap
    assert(triOf(es) === expected)
    val shuffled = Graph.triangleCounts(
      es.toDF("id", "id2").repartition(13), "id", "id2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shuffled === expected)
  }

  // ---------- label propagation ----------

  private def lpaOf(vs: Seq[Long], es: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] =
    Graph.labelPropagation(vs.toDF("id"), es.toDF("id", "id2"),
      "id", "id2", iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Independent straight-line reference: synchronous min-mode LPA. */
  private def refLpa(vs: Seq[Long], es: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] = {
    val adj = es.flatMap { case (a, b) =>
      if (a == b) Nil else Seq(a -> b, b -> a)
    }.distinct.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl = vs.map(v => v -> v).toMap
    for (_ <- 1 to iters) {
      lbl = vs.map { v =>
        v -> adj.get(v).map { nbrs =>
          nbrs.map(lbl).groupBy(identity).view.mapValues(_.size).toSeq
            .sortBy { case (l, c) => (-c, l) }.head._1
        }.getOrElse(lbl(v))
      }.toMap
    }
    lbl
  }

  test("lpa: K3 converges to the min label; isolated vertex keeps its own") {
    val vs = Seq(1L, 2L, 3L, 9L)
    val es = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    assert(lpaOf(vs, es, 3) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
  }

  test("lpa: star oscillates deterministically (sync rounds)") {
    val vs = Seq(9L, 1L, 2L, 3L)
    val es = Seq((9L, 1L), (9L, 2L), (9L, 3L))
    // round 1: leaves adopt the hub's label, hub adopts min leaf
    assert(lpaOf(vs, es, 1) === Map(9L -> 1L, 1L -> 9L, 2L -> 9L, 3L -> 9L))
    // round 2: they swap back — a pure function of the round count
    assert(lpaOf(vs, es, 2) === Map(9L -> 9L, 1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("lpa: matches the reference on a seeded graph, all round counts, " +
      "and is repartition-invariant") {
    val vs = (0L until 20L).toSeq
    val es = (0 until 45).map(i => ((i * 7L) % 20L, (i * 13L + 3L) % 20L))
    for (k <- 1 to 5) assert(lpaOf(vs, es, k) === refLpa(vs, es, k))
    val shuffled = Graph.labelPropagation(vs.toDF("id"),
      es.toDF("id", "id2").repartition(13), "id", "id2", iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shuffled === refLpa(vs, es, 4))
  }

  // ---------- k-core ----------

  private def coreOf(es: Seq[(Long, Long)], k: Int,
      maxRounds: Int = 64): Map[Long, Long] =
    Graph.kCore(es.toDF("id", "id2"), "id", "id2", k, maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("kcore: pendant chain peels away, the triangle core survives") {
    val es = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    // round 1 drops 5 (degree 1), round 2 drops the now-pendant 4
    assert(coreOf(es, 2) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kcore: K4 is its own 3-core; the 4-core is empty") {
    val es = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(coreOf(es.toSeq, 3) ===
      (1L to 4L).map(_ -> 3L).toMap)
    assert(coreOf(es.toSeq, 4) === Map.empty)
  }

  test("kcore: maxRounds returns the exact partial peel") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    // one round removes only the endpoints; the middle survives
    assert(coreOf(path, 2, maxRounds = 1) ===
      Map(2L -> 1L, 3L -> 2L, 4L -> 1L))
    assert(coreOf(path, 2) === Map.empty) // full peel: a path has no 2-core
  }

  test("kcore: duplicate/reversed/self edges normalize; repartition-" +
      "invariant") {
    val es = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 3L),
      (1L, 2L))
    assert(coreOf(es, 2) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    val shuffled = Graph.kCore(es.toDF("id", "id2").repartition(7),
      "id", "id2", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shuffled === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  // ---------- TrustRank ----------

  private def trustOf(vs: Seq[Long], es: Seq[(Long, Long)],
      seeds: Seq[Long], iters: Int): Map[Long, Long] =
    Graph.trustRank(vs.toDF("id"), es.toDF("id", "id2"), "id", "id2",
      seeds.toDF("id"), iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("trustrank: seeding every vertex IS pageRank") {
    val vs = Seq(1L, 2L, 3L, 4L)
    val es = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    assert(trustOf(vs, es, vs, 3) === ranksOf(vs, es, 3))
  }

  test("trustrank: seed path closed form; non-seeds start from zero") {
    val r = trustOf(Seq(1L, 2L), Seq((1L, 2L)), Seq(1L), 1)
    // 2 gets ⌊⌊0.85·Scale⌋/1⌋ from the seed; the seed keeps only its
    // base (nothing flows back from 2's zero start)
    assert(r === Map(1L -> 150000000L, 2L -> 850000000L))
  }

  test("trustrank: isolated vertices — seed keeps base, non-seed stays 0") {
    val r = trustOf(Seq(7L, 8L), Seq.empty, Seq(7L), 3)
    assert(r === Map(7L -> 150000000L, 8L -> 0L))
  }

  // ---------- seed distance ----------

  private def distOf(vs: Seq[Long], es: Seq[(Long, Long)],
      seeds: Seq[Long], maxHops: Int = 8): Map[Long, Option[Int]] =
    Graph.seedDistance(vs.toDF("id"), es.toDF("id", "id2"), "id", "id2",
      seeds.toDF("id"), maxHops)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap

  test("seed distance: path graph BFS closed form with NULL past the cap") {
    val vs = (1L to 6L).toSeq
    val es = (1L to 5L).map(i => (i, i + 1))
    assert(distOf(vs, es, Seq(1L)) === Map(1L -> Some(0), 2L -> Some(1),
      3L -> Some(2), 4L -> Some(3), 5L -> Some(4), 6L -> Some(5)))
    assert(distOf(vs, es, Seq(1L), maxHops = 3) === Map(1L -> Some(0),
      2L -> Some(1), 3L -> Some(2), 4L -> Some(3), 5L -> None, 6L -> None))
  }

  test("seed distance: multi-source takes the MIN; isolated and " +
      "unknown seeds handled") {
    val vs = (1L to 5L).toSeq ++ Seq(9L) // 9 isolated
    val es = (1L to 4L).map(i => (i, i + 1))
    // seeds at both ends + a seed id not in the vertex set (ignored)
    val r = distOf(vs, es, Seq(1L, 5L, 77L))
    assert(r === Map(1L -> Some(0), 2L -> Some(1), 3L -> Some(2),
      4L -> Some(1), 5L -> Some(0), 9L -> None))
  }

  test("seed distance: early exit on exhausted frontier is exact and " +
      "repartition-invariant") {
    // two components; seeds only reach one of them
    val vs = (1L to 6L).toSeq
    val es = Seq((1L, 2L), (2L, 3L), (4L, 5L), (5L, 6L))
    val want = Map(1L -> Some(0), 2L -> Some(1), 3L -> Some(2),
      4L -> None, 5L -> None, 6L -> None)
    assert(distOf(vs, es, Seq(1L), maxHops = 64) === want)
    val shuffled = Graph.seedDistance(vs.toDF("id"),
      es.toDF("id", "id2").repartition(7), "id", "id2",
      Seq(1L).toDF("id"), 64)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(shuffled === want)
  }

  // ---------- link prediction ----------

  private def lpOf(es: Seq[(Long, Long)], maxDeg: Int = 10000)
      : Map[(Long, Long), (Long, Double, Double)] =
    Graph.linkPrediction(es.toDF("id", "id2"), "id", "id2", maxDeg)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("link prediction: path and square closed forms") {
    // path 1-2-3: only candidate (1,3) via middle 2 (deg 2)
    assert(lpOf(Seq((1L, 2L), (2L, 3L))) ===
      Map((1L, 3L) -> ((1L, 1.0, r6(1.0 / math.log(2))))))
    // square: (1,3) and (2,4), each via two degree-2 middles
    val sq = lpOf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)))
    val want = (2L, 1.0, r6(2.0 / math.log(2)))
    assert(sq === Map((1L, 3L) -> want, (2L, 4L) -> want))
  }

  test("link prediction: adjacent pairs are never scored (K4 is empty)") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(lpOf(k4.toSeq) === Map.empty)
  }

  test("link prediction: hub guard drops high-degree middles; jaccard " +
      "uses the true union") {
    val star = (1L to 5L).map(i => (0L, i))
    // all 10 leaf pairs share only the hub (deg 5)
    val full = lpOf(star)
    assert(full.size === 10)
    assert(full((1L, 2L)) === ((1L, 1.0, r6(1.0 / math.log(5)))))
    // cap below the hub degree: no wedges survive
    assert(lpOf(star, maxDeg = 4) === Map.empty)
    // chain 1-2-3-4: (1,3) via 2, (2,4) via 3, (1,4) nothing (no
    // common neighbor); deg(2)=deg(3)=2 so jaccard(1,3)=1/(1+2-1)
    val chain = lpOf(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(chain.keySet === Set((1L, 3L), (2L, 4L)))
    assert(chain((1L, 3L)) === ((1L, 0.5, r6(1.0 / math.log(2)))))
  }

  test("link prediction: normalization and repartition invariance") {
    val es = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 3L), (2L, 3L),
      (3L, 4L), (4L, 5L), (1L, 5L))
    val a = lpOf(es)
    val b = Graph.linkPrediction(
      es.toDF("id", "id2").repartition(7), "id", "id2", 10000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(a === b)
    assert(a.nonEmpty)
  }

  // ---------- degree assortativity ----------

  test("degree assortativity: a star is maximally disassortative " +
      "(r = -1), a regular graph has zero variance (NULL), and a " +
      "barbell of hubs is positive") {
    def rOf(es: Seq[(Long, Long)]): (Long, Option[Double]) = {
      val row = Graph.degreeAssortativity(es.toDF("id", "id2"),
        "id", "id2").collect().head
      (row.getLong(0),
        if (row.isNullAt(1)) None else Some(row.getDouble(1)))
    }
    // star K1,4: every edge joins deg 4 to deg 1 -> r = -1 exactly
    val star = (1L to 4L).map(i => (0L, i))
    val (ne, r) = rOf(star)
    assert(ne === 4L)
    assert(math.abs(r.get + 1.0) < 1e-9)
    // triangle: all degrees 2 -> zero variance -> NULL
    assert(rOf(Seq((1L, 2L), (2L, 3L), (1L, 3L)))._2 === None)
    // two K3s joined hub-to-hub: high-degree ends meet -> r > -1 and
    // the mixed structure is not NULL
    val barbell = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val rb = rOf(barbell)._2.get
    assert(rb < 0.0 && rb > -1.0)
  }

  test("lpa: bridged triangles resolve to two communities") {
    val vs = (1L to 6L).toSeq
    val es = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (4L, 5L), (5L, 6L), (4L, 6L))
    val r = lpaOf(vs, es, 4)
    assert(r === refLpa(vs, es, 4))
    // each triangle is internally uniform and distinct from the other
    assert(Set(r(1L), r(2L)).size === 1 && Set(r(4L), r(5L)).size === 1)
    assert(r(1L) !== r(5L))
  }

  // ---- harmonic centrality (g13) ----

  test("harmonicCentrality: hand-computed path graph, hop bound " +
      "truncates, disconnected components stay finite") {
    // path 1-2-3-4-5 plus isolated edge 8-9
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
      .toDF("a", "b")
    val h3 = Graph.harmonicCentrality(es, "a", "b", maxHops = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // node 3 reaches 1,2,4,5 at d=2,1,1,2: h = 2*1 + 2*0.5 = 3.0
    assert(h3(3L) === ((4L, 3.0)))
    // node 1 reaches 2,3,4 within 3 hops (5 is 4 away): 1 + .5 + 1/3
    assert(h3(1L)._1 === 3L)
    assert(math.abs(h3(1L)._2 - (1.0 + 0.5 + 1.0 / 3.0)) < 1e-6)
    // the isolated pair only sees each other
    assert(h3(8L) === ((1L, 1.0)) && h3(9L) === ((1L, 1.0)))
    // hop bound 1 = plain degree
    val h1 = Graph.harmonicCentrality(es, "a", "b", maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h1(3L) === 2L && h1(1L) === 1L)
  }

  test("harmonicCentrality: duplicate/reversed/self-loop edges " +
      "canonicalize; partitioning does not matter") {
    val noisy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 2L), (2L, 3L))
      .toDF("a", "b")
    def run(parts: Int) =
      Graph.harmonicCentrality(noisy.repartition(parts), "a", "b", 3)
        .orderBy("a").collect().toSeq
    val r = run(1)
    assert(r === run(7))
    // triangle-free path 1-2-3: node 1 sees 2 (d1) and 3 (d2)
    assert(r.map(x => (x.getLong(0), x.getLong(1))) ===
      Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }
}
