package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.range(2000).select(
    col("id").as("doc_id"),
    concat(lit("src"), (col("id") % 4).cast("string")).as("source")).cache()

  test("apportionSample: exactly k rows, largest-remainder seats, " +
      "deterministic and repartition-invariant") {
    // strata 1000/600/400 of 2000, k=7: quotas 3.5/2.1/1.4 ->
    // base 3/2/1 (sum 6), the one leftover seat goes to the largest
    // remainder (src0's .5)
    val strata = docs.withColumn("g",
      when(col("doc_id") < 1000, "a")
        .when(col("doc_id") < 1600, "b").otherwise("c"))
    val out = Sampling.apportionSample(strata, "g", "doc_id", 7)
      .select("g", "doc_id").as[(String, Long)].collect()
    assert(out.length === 7)
    val per = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(per === Map("a" -> 4, "b" -> 2, "c" -> 1))
    val again = Sampling.apportionSample(strata.repartition(13), "g",
      "doc_id", 7).select("g", "doc_id").as[(String, Long)].collect()
    assert(out.toSet === again.toSet)
  }

  test("neymanSample: the variance-heavy stratum wins budget beyond " +
      "its size share; zero-variance strata take none; exact k; " +
      "repartition-invariant") {
    // two equal-size strata (500 each): "wide" spans values 0..499,
    // "tight" is constant 10 -> sigma(tight)=0, all budget to wide
    val df = spark.range(1000).select(
      col("id").as("event_id"),
      when(col("id") < 500, "wide").otherwise("tight").as("g"),
      when(col("id") < 500, col("id").cast("double"))
        .otherwise(lit(10.0)).as("v"))
    val out = Sampling.neymanSample(df, "g", "event_id", "v", k = 100)
      .select("g").as[String].collect()
    assert(out.length === 100)
    assert(out.forall(_ == "wide"),
      "a zero-variance stratum must receive no Neyman budget")
    // three strata, same size, sigmas ~ 1 : 10 : 100 -> allocation
    // tracks N*sigma (within a seat of the exact Hamilton split)
    val tri = spark.range(1500).select(
      col("id").as("event_id"),
      (col("id") % 3).cast("string").as("g"),
      ((col("id") % 100).cast("double") *
        when(col("id") % 3 === 0, 0.1)
          .when(col("id") % 3 === 1, 1.0).otherwise(10.0)).as("v"))
    val per = Sampling.neymanSample(tri, "g", "event_id", "v", k = 111)
      .select("g").as[String].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(per.values.sum === 111)
    assert(per("2") > per("1") && per("1") > per("0"),
      s"allocation must track sigma: $per")
    // sigma ratio 1:10:100 -> roughly 1/111, 10/111, 100/111 seats
    assert(per("2") >= 95 && per("0") <= 5, s"got $per")
    // repartition invariance
    val again = Sampling.neymanSample(tri.repartition(7), "g",
      "event_id", "v", k = 111)
      .select("g", "event_id").as[(String, Long)].collect().toSet
    val first = Sampling.neymanSample(tri, "g", "event_id", "v", k = 111)
      .select("g", "event_id").as[(String, Long)].collect().toSet
    assert(first === again)
  }

  test("apportionSample: proportionality at larger k, null strata " +
      "excluded, ties broken by stratum value") {
    val strata = docs.withColumn("g",
      when(col("doc_id") % 4 === 3, lit(null: String))
        .otherwise(concat(lit("g"), (col("doc_id") % 4).cast("string"))))
    // three 500-row strata (g0,g1,g2), 500 null rows dropped
    val out = Sampling.apportionSample(strata, "g", "doc_id", 99)
      .select("g").as[String].collect()
    assert(out.length === 99)
    val per = out.groupBy(identity).view.mapValues(_.length).toMap
    // 99/3 splits exactly 33/33/33
    assert(per === Map("g0" -> 33, "g1" -> 33, "g2" -> 33))
    // equal remainders: k=2 over three equal strata -> base 0 each,
    // remainders tie, seats go to the lexicographically first strata
    val two = Sampling.apportionSample(strata, "g", "doc_id", 2)
      .select("g").as[String].collect().sorted.toSeq
    assert(two === Seq("g0", "g1"))
    assertThrows[IllegalArgumentException] {
      Sampling.apportionSample(strata, "g", "doc_id", 0)
    }
  }

  test("apportionSample property: output size is exactly k and every " +
      "stratum within one seat of its exact quota, across k and " +
      "skewed strata shapes") {
    // heavily skewed strata: 1400 / 350 / 150 / 100 of 2000
    val strata = docs.withColumn("g",
      when(col("doc_id") < 1400, "big")
        .when(col("doc_id") < 1750, "mid")
        .when(col("doc_id") < 1900, "small").otherwise("tiny"))
    val counts = Map("big" -> 1400.0, "mid" -> 350.0,
      "small" -> 150.0, "tiny" -> 100.0)
    for (k <- Seq(1, 7, 97, 500, 1999)) {
      val per = Sampling.apportionSample(strata, "g", "doc_id", k)
        .groupBy("g").count()
        .as[(String, Long)].collect().toMap.withDefaultValue(0L)
      assert(per.values.sum === k.toLong, s"k=$k must hit exactly")
      counts.foreach { case (g, n) =>
        val quota = k * n / 2000.0
        assert(per(g) >= math.floor(quota).toLong &&
          per(g) <= math.ceil(quota).toLong,
          s"k=$k stratum $g got ${per(g)}, quota $quota")
      }
    }
  }

  test("apportionSample: min(k, N) totality — k = N returns everything " +
      "exactly, k > N returns the whole population instead of a " +
      "silent shortfall") {
    val strata = docs.limit(30).withColumn("g",
      when(col("doc_id") < 20, "a").otherwise("b"))
    // k == N: every base is exactly n_g, zero leftover seats
    assert(Sampling.apportionSample(strata, "g", "doc_id", 30)
      .count() === 30L)
    // k > N: the per-stratum cap binds everywhere -> all rows
    assert(Sampling.apportionSample(strata, "g", "doc_id", 100)
      .count() === 30L)
    // k just under N with a stratum that must absorb a +1 seat
    assert(Sampling.apportionSample(strata, "g", "doc_id", 29)
      .count() === 29L)
  }

  test("kFoldAssign: balanced within strata (sizes differ by <= 1), " +
      "deterministic, null stratum is a real stratum") {
    val strata = docs.limit(103).withColumn("g",
      when(col("doc_id") % 3 === 0, lit(null: String))
        .otherwise((col("doc_id") % 3).cast("string")))
    val out = Sampling.kFoldAssign(strata, "g", "doc_id", 4)
      .select("g", "fold").as[(Option[String], Int)].collect().toSeq
    assert(out.size === 103)
    assert(out.map(_._2).toSet === Set(0, 1, 2, 3))
    out.groupBy(_._1).foreach { case (g, rows) =>
      val sizes = rows.groupBy(_._2).values.map(_.size)
      assert(sizes.max - sizes.min <= 1, s"stratum $g unbalanced")
    }
    // the null stratum got assigned too
    assert(out.exists(_._1.isEmpty))
    val again = Sampling.kFoldAssign(strata.repartition(11), "g",
      "doc_id", 4).select("g", "fold")
      .as[(Option[String], Int)].collect().toSeq
    assert(out.sortBy(r => (r._1.toString, r._2)) ===
      again.sortBy(r => (r._1.toString, r._2)))
  }

  test("kFoldAssign: duplicate ids within a stratum need tieBreak for " +
      "a total order (ADVICE r13)") {
    // two rows share (stratum, id); md5 + id tiebreak alone cannot
    // order them — tieBreak completes the total order and pins which
    // row takes which fold across layouts
    val df = Seq(("g", 1L, "p"), ("g", 1L, "q"), ("g", 2L, "r"))
      .toDF("g", "id", "tag")
    val a = Sampling.kFoldAssign(df, "g", "id", 2, tieBreak = Seq("tag"))
      .select("tag", "fold").as[(String, Int)].collect().sortBy(_._1)
    val b = Sampling.kFoldAssign(df.repartition(7), "g", "id", 2,
      tieBreak = Seq("tag"))
      .select("tag", "fold").as[(String, Int)].collect().sortBy(_._1)
    assert(a === b)
    assert(a.map(_._2).distinct.length === 2) // both folds used
  }

  test("shardAssign/shardManifest: deterministic, layout-independent, " +
      "complete (manifest counts sum to the corpus)") {
    val df = docs.limit(200)
      .select(col("doc_id"), (col("doc_id") % 7 + 1).as("n_chars"))
    val a = Sampling.shardManifest(df, "doc_id", 8, "n_chars")
      .orderBy("shard").collect()
    val b = Sampling.shardManifest(df.repartition(9), "doc_id", 8,
      "n_chars").orderBy("shard").collect()
    assert(a === b)
    assert(a.map(_.getLong(1)).sum === 200L)
    // assignment itself is stable row-for-row
    val s1 = Sampling.shardAssign(df, "doc_id", 8)
      .select("doc_id", "shard").as[(Long, Int)].collect().sortBy(_._1)
    val s2 = Sampling.shardAssign(df.repartition(5), "doc_id", 8)
      .select("doc_id", "shard").as[(Long, Int)].collect().sortBy(_._1)
    assert(s1 === s2)
    assert(s1.map(_._2).forall(s => s >= 0 && s < 8))
  }

  test("resampleToMix keeps ~fraction per group, deterministically") {
    val mix = Map("src0" -> 0.5, "src1" -> 0.0)
    def run() = Sampling.resampleToMix(docs, col("source"), col("doc_id"),
      mix, defaultFraction = 1.0)
    val a = run().select("doc_id").as[Long].collect().toSet
    assert(a === run().select("doc_id").as[Long].collect().toSet,
      "must be run-to-run deterministic")
    // excluded group fully dropped; default groups fully kept
    val bySource = run().groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(!bySource.contains("src1"))
    assert(bySource("src2") === 500L && bySource("src3") === 500L)
    val kept = bySource.getOrElse("src0", 0L).toDouble / 500.0
    assert(kept > 0.4 && kept < 0.6, s"src0 kept fraction $kept far from 0.5")
  }

  test("deterministicShuffle: seeded, reproducible, seed-independent orders") {
    def order(seed: Long): Seq[Long] =
      Sampling.deterministicShuffle(docs, col("doc_id"), seed)
        .select("doc_id").as[Long].collect().toSeq
    val a = order(1L)
    assert(a === order(1L), "same seed must reproduce the same order")
    assert(a !== order(2L), "different seed must give a different order")
    assert(a.sorted === (0L until 2000L), "a permutation, nothing lost")
    // a genuine shuffle, not the identity
    assert(a.take(20) !== (0L until 20L).toSeq)
  }

  test("hashSplit: stable under corpus growth, ~weight proportions") {
    val w = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    val full = Sampling.hashSplit(docs, col("doc_id"), w)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // THE leakage-prevention property: recomputing the split over a
    // subset (or a grown corpus) never moves a row between splits
    val subset = Sampling.hashSplit(docs.where(col("doc_id") < 500),
      col("doc_id"), w)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    subset.foreach { case (id, s) => assert(full(id) === s) }
    val frac = full.values.groupBy(identity).view.mapValues(_.size / 2000.0)
    assert(math.abs(frac("train") - 0.75) < 0.05, frac)
    assert(math.abs(frac("val") - 0.125) < 0.03, frac)
    assert(math.abs(frac("test") - 0.125) < 0.03, frac)
  }

  test("packSequences: next-fit layout invariants hold per shard") {
    import graft.operators.TextAnalysis
    val chunks = Seq(
      ("a", 1L, 100L), ("a", 2L, 100L), ("a", 3L, 100L), ("a", 4L, 30L),
      ("b", 1L, 300L), ("b", 2L, 10L)).toDF("shard", "cid", "len")
    val got = TextAnalysis.packSequences(chunks, col("shard"),
      Seq(col("cid")), col("len"), budget = 256L)
      .select("shard", "cid", "seq", "seq_offset")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      // shard a: cum-before 0,100,200,300 -> seqs 0,0,0,1
      ("a", 1L, 0L, 0L), ("a", 2L, 0L, 100L), ("a", 3L, 0L, 200L),
      ("a", 4L, 1L, 44L), // 300 % 256
      // shard b independent: 0,300
      ("b", 1L, 0L, 0L), ("b", 2L, 1L, 44L)))
    // offsets always within budget; seq monotone in chunk order per shard
    got.foreach { case (_, _, _, off) => assert(off >= 0 && off < 256) }
  }

  test("packSequencesExact: zero overflow, oversized chunk isolated") {
    import graft.operators.TextAnalysis
    val chunks = Seq(
      ("a", 1L, 100L), ("a", 2L, 100L), ("a", 3L, 100L), // 3rd overflows
      ("a", 4L, 300L),                                   // > budget: alone
      ("a", 5L, 50L),
      ("b", 1L, 256L), ("b", 2L, 1L)).toDF("shard", "cid", "len")
    val got = TextAnalysis.packSequencesExact(chunks, col("shard"),
      col("cid"), col("len"), budget = 256L)
      .select("shard", "ord", "seq", "seq_offset")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("a", 1L, 0L, 0L), ("a", 2L, 0L, 100L), // 200 fits
      ("a", 3L, 1L, 0L),                      // would hit 300 -> new seq
      ("a", 4L, 2L, 0L),                      // oversized, isolated
      ("a", 5L, 3L, 0L),                      // 300+50 > 256 -> new seq
      ("b", 1L, 0L, 0L), ("b", 2L, 1L, 0L)))  // exact fill then next
    // invariant: no sequence's total exceeds the budget unless it is a
    // single oversized chunk
    val totals = got.groupBy(r => (r._1, r._3)).map { case (_, rs) =>
      rs.toSeq.map(r => chunks.where($"shard" === r._1 && $"cid" === r._2)
        .head.getLong(2)).sum -> rs.size
    }
    totals.foreach { case (tot, n) => assert(tot <= 256 || n === 1) }
  }

  test("temperature mix flattens skew by downsampling only") {
    // heavily skewed: srcA 1600 docs, srcB 100, srcC 4
    val skewed = spark.range(1704).select(col("id").as("doc_id"),
      when(col("id") < 1600, "srcA")
        .when(col("id") < 1700, "srcB").otherwise("srcC").as("source"))
    val kept = Sampling.resampleTemperature(skewed, col("source"),
        col("doc_id"))
      .groupBy("source").count()
      .as[(String, Long)].collect().toMap
    // argmin(n/sqrt(n)) = smallest source keeps EVERYTHING
    assert(kept("srcC") === 4L)
    // dominant source flattens toward sqrt-proportional share: its raw
    // share is 94%; after alpha=1/2 the target share is
    // sqrt(1600)/(sqrt(1600)+sqrt(100)+sqrt(4)) = 40/52 ~ 77%
    val total = kept.values.sum.toDouble
    val shareA = kept("srcA") / total
    assert(shareA < 0.85 && shareA > 0.6, s"srcA share $shareA not flattened")
    // keep prob for srcA = sqrt(1600)*C/1600 with C = 4/sqrt(4)=2 -> 5%
    assert(math.abs(kept("srcA") - 1600 * (40.0 * 2 / 1600)) <= 20,
      s"srcA kept ${kept("srcA")} far from expectation 80")
    // deterministic under re-run
    val again = Sampling.resampleTemperature(skewed, col("source"),
      col("doc_id")).select("doc_id").as[Long].collect().toSet
    assert(again === Sampling.resampleTemperature(skewed, col("source"),
      col("doc_id")).select("doc_id").as[Long].collect().toSet)
  }

  test("lower fraction samples are strict subsets (monotone thresholds)") {
    def ids(f: Double) = Sampling.resampleToMix(docs, col("source"),
      col("doc_id"), Map.empty, defaultFraction = f)
      .select("doc_id").as[Long].collect().toSet
    val q = ids(0.25); val h = ids(0.5); val all = ids(1.0)
    assert(q.subsetOf(h) && h.subsetOf(all),
      "same uniform + lower threshold must nest")
    assert(all.size === 2000)
    assert(q.nonEmpty && q.size < h.size && h.size < all.size)
  }

  test("tokenBudgetMix: budgets fill (crossing doc included), " +
      "unbudgeted groups drop, selection is deterministic") {
    val rows = ((1 to 10).map(i => (i.toLong, "a", 100)) ++
      (11 to 15).map(i => (i.toLong, "b", 100)) ++
      (16 to 18).map(i => (i.toLong, "c", 100)))
      .toDF("doc_id", "g", "n_tokens")
    val kept = Sampling.tokenBudgetMix(rows, col("g"), col("doc_id"),
      col("n_tokens"), Map("a" -> 250L, "b" -> 10000L))
    val byG = kept.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // a: before-sums 0,100,200 are < 250 -> exactly 3 docs (300 tokens,
    // the budget-crossing doc included); b: budget above total -> all 5;
    // c: no budget -> dropped
    assert(byG === Map("a" -> 3L, "b" -> 5L))
    val total = kept.where(col("g") === "a")
      .agg(sum(col("n_tokens"))).head.getLong(0)
    assert(total >= 250L, "budget must be met when the group can fill it")
    assert(total - 100L < 250L, "only the crossing doc may overflow")
    // determinism: identical id set on re-run
    val again = Sampling.tokenBudgetMix(rows, col("g"), col("doc_id"),
      col("n_tokens"), Map("a" -> 250L, "b" -> 10000L))
      .select("doc_id").as[Long].collect().toSet
    assert(again === kept.select("doc_id").as[Long].collect().toSet)
    // all input columns survive
    assert(kept.columns.toSeq === rows.columns.toSeq)
  }

  test("repeatMix: integer copies exact, fractional copies ~p, " +
      "deterministic, zero drops the group") {
    val tiers = docs.withColumn("tier",
      when(col("source") === "src0", "up")
        .when(col("source") === "src1", "down").otherwise("unit"))
    def run() = Sampling.repeatMix(tiers, col("tier"), col("doc_id"),
      Map("up" -> 2.5, "down" -> 0.0), defaultRepeat = 1.0)
    val out = run().cache()
    // zero factor: group gone entirely
    assert(out.where(col("tier") === "down").count() === 0)
    // unit factor: exactly one copy each, repeat_idx 0
    assert(out.where(col("tier") === "unit").count() === 1000)
    assert(out.where(col("tier") === "unit" && col("repeat_idx") =!= 0)
      .count() === 0)
    // 2.5x: every doc has copies 0 and 1; ~half have a third
    val up = out.where(col("tier") === "up")
    val perDoc = up.groupBy("doc_id").count()
      .select("count").as[Long].collect()
    assert(perDoc.length === 500 && perDoc.forall(n => n == 2 || n == 3))
    val three = perDoc.count(_ == 3)
    assert(three > 200 && three < 300, s"third-copy rate $three/500 off 0.5")
    // deterministic under re-run
    val a = out.select("doc_id", "repeat_idx").as[(Long, Int)]
      .collect().toSet
    assert(a === run().select("doc_id", "repeat_idx").as[(Long, Int)]
      .collect().toSet)
  }

  test("tokenBudgetMix: null ids survive the sharded path exactly like " +
      "the single-window path") {
    val rows = ((1 to 20).map(i => (Option(i.toLong), "a", 50)) :+
      ((Option.empty[Long], "a", 50))).toDF("doc_id", "g", "n_tokens")
    def ids(shards: Int) = Sampling.tokenBudgetMix(rows, col("g"),
      col("doc_id"), col("n_tokens"), Map("a" -> 400L),
      numShards = shards)
      .select("doc_id").as[Option[Long]].collect().toSet
    val single = ids(1)
    assert(single.contains(None),
      "null md5 sorts first: the null-id doc is in the prefix")
    assert(ids(16) === single,
      "sharded path must not drop null-id rows (they map to shard 0)")
  }

  test("tokenBudgetMix property: kept set is a hash-order prefix, " +
      "budget met iff the group can fill it, minimal overflow") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { i =>
      (i.toLong, s"g${rnd.nextInt(5)}", 1 + rnd.nextInt(200))
    }.toDF("doc_id", "g", "n_tokens")
    val budgets = Map("g0" -> 1000L, "g1" -> 1L, "g2" -> 100000L,
      "g3" -> 500L) // g4 unbudgeted
    val kept = Sampling.tokenBudgetMix(rows, col("g"), col("doc_id"),
      col("n_tokens"), budgets)
      .select("doc_id", "g", "n_tokens")
      .as[(Long, String, Int)].collect()
    val all = rows.select("doc_id", "g", "n_tokens")
      .as[(Long, String, Int)].collect()
    def hashKey(id: Long) =
      (org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString), id)
    val keptByG = kept.groupBy(_._2).view.mapValues(_.toSeq).toMap
    assert(!keptByG.contains("g4"), "unbudgeted group must drop")
    for ((g, budget) <- budgets) {
      val groupAll = all.filter(_._2 == g).sortBy(r => hashKey(r._1))
      val groupKept = keptByG.getOrElse(g, Nil)
      // prefix property: kept ids are exactly the first k in hash order
      val k = groupKept.size
      assert(groupKept.map(_._1).toSet ===
        groupAll.take(k).map(_._1).toSet, s"$g kept set not a prefix")
      val total = groupKept.map(_._3.toLong).sum
      val groupTotal = groupAll.map(_._3.toLong).sum
      if (groupTotal >= budget) {
        assert(total >= budget, s"$g budget unmet: $total < $budget")
        // dropping the last kept doc must fall under budget
        val lastLen = groupAll(k - 1)._3
        assert(total - lastLen < budget, s"$g kept more than needed")
      } else assert(k === groupAll.size,
        s"$g cannot fill its budget — must keep everything")
    }
  }

  test("tokenBudgetMix two-phase sharded prefix sum: identical output " +
      "to the single-window path, window parallelism > 1 per group") {
    val rnd = new scala.util.Random(31)
    // ONE giant mixture group (the adversarial case: a single window
    // partition at numShards=1) plus a second group for cross-group
    // isolation
    val rows = ((1 to 2000).map(i => (i.toLong, "web", 1 + rnd.nextInt(50))) ++
      (2001 to 2200).map(i => (i.toLong, "code", 1 + rnd.nextInt(50))))
      .toDF("doc_id", "g", "n_tokens")
    val budgets = Map("web" -> 9000L, "code" -> 2500L)
    val single = Sampling.tokenBudgetMix(rows, col("g"), col("doc_id"),
      col("n_tokens"), budgets)
      .select("doc_id").as[Long].collect().toSet
    for (shards <- Seq(4, 16, 256)) {
      val sharded = Sampling.tokenBudgetMix(rows, col("g"), col("doc_id"),
        col("n_tokens"), budgets, numShards = shards)
        .select("doc_id").as[Long].collect().toSet
      assert(sharded === single,
        s"numShards=$shards must reproduce the single-window output")
    }
    // scale proof: the giant group's cumsum really spreads over many
    // (group, shard) window partitions instead of one task
    val shardOf = (conv(substring(md5(col("doc_id").cast("string")), 1, 2),
      16, 10).cast("long") * 16 / 256).cast("int")
    val occupied = rows.where(col("g") === "web")
      .select(shardOf.as("s")).distinct().count()
    assert(occupied > 1, "one group must occupy multiple shards")
    // and the plan windows by (group, shard), not by group alone
    val plan = Sampling.tokenBudgetMix(rows, col("g"), col("doc_id"),
      col("n_tokens"), budgets, numShards = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__shard"),
      "two-phase plan must partition window work by shard")
  }

  test("interleaveByGroup: two-level rank equals the single-window rank; " +
      "groups cycle at equal rank; deterministic across layouts") {
    import org.apache.spark.sql.expressions.Window
    val got = Sampling.interleaveByGroup(docs, col("source"), col("doc_id"),
      seed = 7L)
      .select("doc_id", "source", "interleave_rank")
      .as[(Long, String, Long)].collect().toSeq
    // reference: the plain one-window-per-group rank
    val key = graft.operators.Dedup.md5Hash60(
      concat_ws(":", lit(7L), col("doc_id").cast("string")))
    val ref = docs.withColumn("interleave_rank",
        row_number().over(Window.partitionBy(col("source"))
          .orderBy(key, col("doc_id"))).cast("long"))
      .orderBy(col("interleave_rank"), col("source"), col("doc_id"))
      .select("doc_id", "source", "interleave_rank")
      .as[(Long, String, Long)].collect().toSeq
    assert(got === ref, "two-level rank must equal the single-window rank")
    // round-robin: the first |groups| rows are rank 1, one per group
    // (equal-sized groups here => full cycles throughout)
    val groups = docs.select("source").distinct().count().toInt
    assert(got.take(groups).map(_._3).forall(_ == 1L))
    assert(got.take(groups).map(_._2).distinct.size === groups)
    // pure function of (seed, group, id): repartitioned input, same order
    val re = Sampling.interleaveByGroup(docs.repartition(13),
      col("source"), col("doc_id"), seed = 7L)
      .select("doc_id", "source", "interleave_rank")
      .as[(Long, String, Long)].collect().toSeq
    assert(re === got)
    // the rank plan partitions by (group, bucket), not group alone
    val plan = Sampling.interleaveByGroup(docs, col("source"),
      col("doc_id"), seed = 7L).queryExecution.executedPlan.toString
    assert(plan.contains("__ibkt"),
      "two-level plan must partition window work by key bucket")
    // a null group is its own partition (null-safe offset join), not
    // silently dropped
    val withNull = docs.withColumn("source",
      when(col("doc_id") < 5, lit(null).cast("string"))
        .otherwise(col("source")))
    val nulls = Sampling.interleaveByGroup(withNull, col("source"),
      col("doc_id"), seed = 7L)
    assert(nulls.count() === docs.count())
    assert(nulls.where(col("source").isNull)
      .select("interleave_rank").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("leakageSafeSplit keeps every near-dup cluster in ONE split " +
      "and matches hashSplit on the representative") {
    val docs = spark.range(300).select(col("id").as("doc_id"))
    // chains of 3: (0,1),(1,2), (10,11),(11,12), ... — clusters
    // {3k, 3k+1, 3k+2} for k % 2 == 0; odd triples stay singletons
    val pairs = spark.range(50).filter(col("id") % 2 === 0)
      .select((col("id") * 3).as("doc_id"),
        (col("id") * 3 + 1).as("doc_id_2"))
      .union(spark.range(50).filter(col("id") % 2 === 0)
        .select((col("id") * 3 + 1).as("doc_id"),
          (col("id") * 3 + 2).as("doc_id_2")))
    val out = Sampling.leakageSafeSplit(docs, "doc_id", pairs,
      "doc_id_2", Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
      .select("doc_id", "component", "split")
      .as[(Long, Long, String)].collect()
    assert(out.length === 300)
    // every cluster has exactly one split value
    val byComp = out.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(byComp.values.forall(_.size == 1),
      "a cluster must never straddle splits")
    // clustered docs carry the min id as representative
    val m = out.map(r => r._1 -> r._2).toMap
    assert(m(6L) === 6L && m(7L) === 6L && m(8L) === 6L,
      "chain {6,7,8} labels by min id")
    assert(m(3L) === 3L, "singleton labels itself")
    // the split equals hashSplit applied to the representative
    val viaRep = Sampling.hashSplit(
      out.map(r => (r._1, r._2)).toSeq.toDF("doc_id", "component"),
      col("component"),
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(out.forall(r => viaRep(r._1) === r._3))
    // all three splits actually occur across the 250 components
    assert(out.map(_._3).toSet === Set("train", "val", "test"))
  }

  test("negativeSample: deterministic, ≤ k per anchor, never a positive") {
    // docs 0..39; doc 1 is a byte-identical copy of doc 0 (same fp)
    val docs = spark.range(40)
      .select(col("id").as("doc_id"),
        when(col("id") <= 1, lit("same"))
          .otherwise(concat(lit("t"), col("id"))).as("text"))
      .withColumn("fp", md5(col("text")))
    val anchors = docs.where(col("doc_id") < 4)
      .select(col("doc_id").as("anchor_id"), col("fp"))
    val out = Sampling.negativeSample(docs, "doc_id", "fp",
      anchors, "anchor_id", k = 5)
      .orderBy("anchor_id", "slot")
      .as[(Long, Int, Long)].collect()

    // ≤ k per anchor
    val perAnchor = out.groupBy(_._1).view.mapValues(_.length)
    assert(perAnchor.values.forall(_ <= 5))
    // no self-negatives, and anchor 0 never draws its exact dup (doc 1)
    assert(out.forall { case (a, _, n) => a != n })
    assert(!out.exists { case (a, _, n) =>
      (a == 0L && n == 1L) || (a == 1L && n == 0L) })
    // deterministic across runs and repartitionings
    val again = Sampling.negativeSample(docs.repartition(7), "doc_id", "fp",
      anchors, "anchor_id", k = 5)
      .orderBy("anchor_id", "slot")
      .as[(Long, Int, Long)].collect()
    assert(out.toSeq === again.toSeq)
    // slots are the deterministic probe positions: re-derive by hand
    val n = 40L
    val posOrder = (0L until n).sortBy(id => ((id * 2654435761L) % 1000000007L, id))
    val byPos = posOrder.zipWithIndex.map { case (id, p) => p.toLong -> id }.toMap
    val fpOf = (id: Long) => if (id <= 1L) "same" else "t" + id
    val expect = for {
      a <- 0L until 4L
      j <- 0 until 5
      p = (a * 2654435761L + (j + 1) * 40503L) % n
      neg = byPos(p)
      if neg != a && fpOf(neg) != fpOf(a)
    } yield (a, j, neg)
    assert(out.toSeq === expect.toSeq)
  }
}
