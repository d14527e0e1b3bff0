package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Similarity}

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f, 0.0f), 0),
    (2L, Array(0.0f, 1.0f, 0.0f), 0),
    (3L, Array(0.0f, 0.0f, 1.0f), 1),
    (4L, Array(1.0f, 0.0f, 0.01f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("cosine matches a hand-computed value") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b"))).head.getDouble(0)
    val want = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(got === want)
  }

  test("bruteForceTopK ranks by cosine desc, skips self") {
    val q = vecs.where($"vec_id" === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val got = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      q, "qid", "qv", 3)
      .orderBy("rank").select("vec_id").as[Long].collect()
    assert(got === Array(4L, 1L, 2L)) // 4 ≈ colinear, then 1, then orthogonal 2
  }

  test("nearDupPairs respects label blocking and threshold") {
    val pairs = Similarity.nearDupPairs(vecs, "vec_id", "embedding",
      "label", 0.9)
      .select("vec_id", "vec_id_2").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L))) // (0,4) cross-label: excluded; (3,4) sim≈0.01
  }

  test("lshTopK returns a subset consistent with brute force ranking") {
    val q = vecs.where($"vec_id" === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val brute = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      q, "qid", "qv", 5).select("vec_id", "sim").as[(Long, Double)].collect().toMap
    val approx = Similarity.lshTopK(vecs, "vec_id", "embedding",
      q, "qid", "qv", k = 5, dim = 3, bits = 2)
      .select("vec_id", "sim").as[(Long, Double)].collect()
    assert(approx.nonEmpty)
    approx.foreach { case (id, sim) => assert(brute(id) === sim) }
  }

  test("ivfTopK with nprobe = nlist is exactly brute force") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .limit(200).cache()
    val q = emb.limit(5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      q, "qid", "qv", 10)
      .select("qid", "vec_id", "rank").as[(Long, Long, Int)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding",
      q, "qid", "qv", k = 10, nlist = 8, nprobe = 8, iters = 3)
      .select("qid", "vec_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(ivf === brute)
  }

  test("ivfTopK partial probing keeps usable recall and is deterministic") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .limit(500).cache()
    val q = emb.limit(8)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      q, "qid", "qv", 10)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    def run() = Similarity.ivfTopK(emb, "vec_id", "embedding",
      q, "qid", "qv", k = 10, nlist = 16, nprobe = 4, iters = 3)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val a = run(); val b = run()
    assert(a === b, "IVF must be run-to-run deterministic")
    val recall = (a & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall@10 too low: $recall")
  }

  test("IVF recall is monotone in nprobe (multi-probe >= single-probe)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .limit(500).cache()
    val q = emb.limit(8)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      q, "qid", "qv", 10)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    def recallAt(nprobe: Int): Double = {
      val got = Similarity.ivfTopK(emb, "vec_id", "embedding",
        q, "qid", "qv", k = 10, nlist = 16, nprobe = nprobe, iters = 3)
        .select("qid", "vec_id").as[(Long, Long)].collect().toSet
      (got & brute).size.toDouble / brute.size
    }
    // probe cells are ranked by centroid similarity, so nprobe=p+1 probes
    // a strict superset of nprobe=p's cells — candidates only grow
    val r1 = recallAt(1); val r4 = recallAt(4); val r16 = recallAt(16)
    assert(r4 >= r1, s"recall fell when probing more cells: $r1 -> $r4")
    assert(r16 >= r4 && r16 === 1.0, s"exhaustive probe must be exact: $r16")
  }

  test("native TopCells == the greatest(struct(cosine, i)) composition " +
      "it replaced, including ties, null sims, and full ordering") {
    // random-ish deterministic vectors + centroids, with a DUPLICATED
    // centroid (guaranteed sim ties -> larger cell must win) and a zero
    // centroid (null sim -> sorts below every non-null)
    val dim = 8
    def vec(seed: Long): Array[Double] = Array.tabulate(dim)(i =>
      ((graft.functions.GraftFunctions.splitmix64(seed * 64 + i) >>> 11)
        .toDouble / (1L << 53).toDouble) - 0.5)
    val cents: Array[Array[Double]] =
      (0 until 6).map(c => vec(1000L + c)).toArray ++
        Array(vec(1002L)) ++ // duplicate of cell 2 -> ties
        Array(Array.fill(dim)(0.0)) // zero centroid -> null sim
    val rows = spark.range(64).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (shiftrightunsigned(xxhash64(col("id") * dim + i), 11)
          .cast("double") / (1L << 53).toDouble) - 0.5).as("v"))
    val composition = greatest(cents.toIndexedSeq.zipWithIndex.map {
      case (c, i) => struct(
        Similarity.cosine(col("v"), typedlit(c.toSeq)).as("s"),
        lit(i).as("i"))
    }: _*).getField("i")
    val got = rows.select(
      composition.as("want"),
      element_at(graft.functions.GraftFunctions.topCells(col("v"), cents, 1),
        1).as("native"),
      graft.functions.GraftFunctions.topCells(col("v"), cents, cents.length)
        .as("all"))
      .collect()
    got.foreach { r =>
      assert(r.getInt(1) === r.getInt(0), "argmax parity")
      // the full ordering is a permutation of all cells with the null-sim
      // zero centroid last
      val all = r.getSeq[Int](2)
      assert(all.sorted === (0 until cents.length))
      assert(all.last === cents.length - 1, "null-sim cell sorts last")
    }
    // a zero INPUT vector: every sim null -> composition picks the
    // largest cell; native must agree
    val zero = Seq(Tuple1(Array.fill(dim)(0.0))).toDF("v")
    val z = zero.select(composition.as("want"),
      element_at(graft.functions.GraftFunctions.topCells(col("v"), cents, 1),
        1).as("native")).head()
    assert(z.getInt(1) === z.getInt(0))
  }

  test("PQ: exact reconstruction when codebooks cover the subvector space") {
    // 4 distinct subvectors per subspace, ksub=4 -> k-means inits on the
    // distinct set and reconstruction is EXACT
    val base = Seq(
      Array(1.0f, 0.0f, 5.0f, 5.0f),
      Array(0.0f, 1.0f, 5.0f, 5.0f),
      Array(1.0f, 1.0f, 0.0f, 5.0f),
      Array(0.0f, 0.0f, 5.0f, 0.0f))
    val corpus = (0 until 40).map(i => (i.toLong, base(i % 4))).toDF("vec_id", "embedding")
    val cb = Similarity.trainPqCodebooks(corpus, "vec_id", "embedding",
      m = 2, ksub = 4, iters = 3)
    val rec = corpus
      .withColumn("dv", Similarity.pqDecode(
        Similarity.pqEncode(col("embedding"), cb), cb))
      .select(col("vec_id"), col("embedding"), col("dv"))
      .as[(Long, Array[Float], Array[Double])].collect()
    rec.foreach { case (_, orig, dec) =>
      assert(dec.toSeq === orig.map(_.toDouble).toSeq)
    }
  }

  test("PQ: codes are m bytes; error shrinks with ksub; usable recall") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .limit(300).cache()
    def mse(ksub: Int): Double = {
      val cb = Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
        m = 8, ksub = ksub, iters = 3)
      emb.withColumn("dv", Similarity.pqDecode(
          Similarity.pqEncode(col("embedding"), cb), cb))
        .select(avg(aggregate(
          zip_with(Similarity.asDouble(col("embedding")), col("dv"),
            (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x)))
        .head.getDouble(0)
    }
    // 8 bytes per 64-dim float vector = 32x compression
    val cb = Similarity.trainPqCodebooks(emb, "vec_id", "embedding", m = 8,
      ksub = 128, iters = 3)
    val lens = emb.select(length(
        Similarity.pqEncode(col("embedding"), cb)).as("l"))
      .select(min("l"), max("l")).head
    assert(lens.getInt(0) === 8 && lens.getInt(1) === 8)
    // larger codebooks can only fit better (same init prefix + k-means)
    assert(mse(128) <= mse(16),
      "reconstruction error must shrink with codebook size")
    // asymmetric-distance top-k keeps usable recall vs brute force
    val q = emb.limit(5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      q, "qid", "qv", 10)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(emb, "vec_id", "embedding",
      q, "qid", "qv", k = 10, m = 8, ksub = 128, iters = 3)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (pq & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"PQ recall@10 too low: $recall")
  }

  test("IVF cell-partitioned corpus: probes prune partitions at scan") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(300)
    val centroids = Similarity.trainIvfCentroids(emb, "vec_id", "embedding",
      nlist = 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivf_cells")
      .toString + "/corpus"
    graft.sources.LakeWriter.appendPartitioned(
      emb.withColumn("cell",
        Similarity.assignCell(Similarity.asDouble(col("embedding")), centroids)),
      dir, Seq("cell"))
    // a query probing 2 of 8 cells only scans those partitions
    val probed = spark.read.parquet(dir).where(col("cell").isin(0, 1))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"expected partition pruning on cell:\n${plan.take(800)}")
    // and the pruned read returns exactly the rows assigned to those cells
    val wantIds = emb.withColumn("cell",
      Similarity.assignCell(Similarity.asDouble(col("embedding")), centroids))
      .where(col("cell").isin(0, 1)).select("vec_id")
      .as[Long].collect().sorted
    assert(probed.select("vec_id").as[Long].collect().sorted === wantIds)
  }

  test("int8 quantization: bounded error, high top-k recall, 4x smaller") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .limit(300).cache()
    // reconstruction error bounded by scale/2 per element
    val err = emb.select(
      Similarity.quantize(col("embedding")).as("q"),
      Similarity.asDouble(col("embedding")).as("v"))
      .select(aggregate(
        zip_with(Similarity.dequantize(col("q")), col("v"),
          (a, b) => abs(a - b) - col("q").getField("scale") / 2 - lit(1e-9)),
        lit(0.0), (acc, x) => greatest(acc, x)).as("excess"))
      .agg(max("excess")).head.getDouble(0)
    assert(err <= 0.0, s"reconstruction error exceeded scale/2 by $err")

    // top-k via quantized corpus ≈ exact top-k
    val q = emb.limit(5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      q, "qid", "qv", 10)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val quant = {
      val qc = emb.withColumn("__q", Similarity.quantize(col("embedding")))
      val joined = qc.join(broadcast(q))
        .where(col("qid") =!= col("vec_id"))
        .withColumn("sim", Similarity.quantizedCosine(col("__q"), col("qv")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(desc("sim"), col("vec_id"))
      joined.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 10)
        .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    }
    val recall = (quant & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"quantized recall@10 too low: $recall")
  }

  test("IVF x PQ composition: bounded candidates, stacked-approx recall") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .limit(400).cache()
    val q = emb.limit(5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      q, "qid", "qv", 10)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val ivfpq = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      q, "qid", "qv", k = 10, nlist = 8, nprobe = 4, m = 8, ksub = 64)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (ivfpq & exact).size.toDouble / exact.size
    assert(recall >= 0.4,
      s"stacked IVF+PQ recall@10 too low: $recall") // two approximations
    // deterministic: training samples, assignment, and ranking have no RNG
    val again = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      q, "qid", "qv", k = 10, nlist = 8, nprobe = 4, m = 8, ksub = 64)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    assert(again === ivfpq)
    // probing every cell recovers the pure-PQ ranking (IVF layer exact)
    val allCells = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      q, "qid", "qv", k = 10, nlist = 8, nprobe = 8, m = 8, ksub = 64)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val purePq = Similarity.pqTopK(emb, "vec_id", "embedding",
      q, "qid", "qv", k = 10, m = 8, ksub = 64)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    assert(allCells === purePq,
      "nprobe=nlist must reduce IVFPQ to pure PQ ranking")
  }

  test("ADC scoring: identical top-k to decode+cosine, sims within 1e-9") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .limit(400).cache()
    val q = emb.limit(6)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val decodePath = Similarity.pqTopK(emb, "vec_id", "embedding",
      q, "qid", "qv", k = 10, m = 8, ksub = 64)
    val adcPath = Similarity.pqTopKAdc(emb, "vec_id", "embedding",
      q, "qid", "qv", k = 10, m = 8, ksub = 64)
    // same candidates in the same order
    val d = decodePath.select("qid", "rank", "vec_id")
      .as[(Long, Int, Long)].collect().sorted
    val a = adcPath.select("qid", "rank", "vec_id")
      .as[(Long, Int, Long)].collect().sorted
    assert(a === d)
    // scores agree to fp-regrouping tolerance
    val maxDiff = decodePath.select(col("qid"), col("vec_id"),
        col("sim").as("sim_d"))
      .join(adcPath.select(col("qid"), col("vec_id"), col("sim").as("sim_a")),
        Seq("qid", "vec_id"))
      .agg(max(abs(col("sim_d") - col("sim_a")))).head.getDouble(0)
    assert(maxDiff < 1e-9, s"ADC diverged from decode+cosine by $maxDiff")
    // and the same holds inside the IVF composition
    val ivfD = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      q, "qid", "qv", k = 10, nlist = 8, nprobe = 4, m = 8, ksub = 64)
      .select("qid", "rank", "vec_id").as[(Long, Int, Long)].collect().sorted
    val ivfA = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      q, "qid", "qv", k = 10, nlist = 8, nprobe = 4, m = 8, ksub = 64,
      adc = true)
      .select("qid", "rank", "vec_id").as[(Long, Int, Long)].collect().sorted
    assert(ivfA === ivfD)
  }

  test("ADC null semantics mirror CosineSim: zero/malformed query -> null") {
    import graft.functions.GraftFunctions
    val cb = Similarity.trainPqCodebooks(
      spark.read.parquet(s"$sf/embeddings.parquet").limit(200),
      "vec_id", "embedding", m = 8, ksub = 16, iters = 2)
    val dim = cb.length * cb(0)(0).length
    val rows = Seq(
      ("zero", Array.fill(dim)(0.0)),          // zero norm -> null score
      ("short", Array.fill(dim - 1)(1.0)),     // dim mismatch -> null lut
      ("ok", Array.tabulate(dim)(i => (i % 5 + 1).toDouble))
    ).toDF("tag", "qv")
    val codes = spark.read.parquet(s"$sf/embeddings.parquet").limit(1)
      .select(GraftFunctions.pqEncode(
        Similarity.asDouble(col("embedding")), cb).as("codes"))
    val got = codes.join(rows)
      .select(col("tag"), GraftFunctions.pqAdcScore(col("codes"),
        GraftFunctions.pqAdcLut(col("qv"), cb), cb).as("sim"))
      .as[(String, Option[Double])].collect().toMap
    assert(got("zero").isEmpty)
    assert(got("short").isEmpty)
    assert(got("ok").nonEmpty)
  }

  test("fused quantize roundtrip is bit-identical to the HOF composition") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(300)
    val mismatches = emb.select(
        Similarity.quantizeRoundtrip(col("embedding")).as("fused"),
        Similarity.dequantize(Similarity.quantize(col("embedding"))).as("hof"))
      .where(not(col("fused") <=> col("hof")))
      .count()
    assert(mismatches === 0L)
    // null elements and degenerate vectors behave like the composition
    val edge = Seq(
      (1L, Seq(Some(1.0f), None, Some(3.0f))),
      (2L, Seq(Option.empty[Float])),          // all-null
      (3L, Seq.empty[Option[Float]]),          // empty
      (4L, Seq(Some(2.5f), Some(2.5f)))        // constant (scale fallback)
    ).toDF("id", "embedding")
    val bad = edge.select(
        Similarity.quantizeRoundtrip(col("embedding")).as("fused"),
        Similarity.dequantize(Similarity.quantize(col("embedding"))).as("hof"))
      .where(not(col("fused") <=> col("hof"))).count()
    assert(bad === 0L)
  }

  test("multimodal decode stub is deterministic and batch-shaped") {
    val bin = Multimodal.attachBinary(
      Seq((1L, "hello"), (2L, "world")).toDF("doc_id", "text"), "text", "image")
    val a = Multimodal.decodeImages(bin, "doc_id", "payload", 4).collect()
    val b = Multimodal.decodeImages(bin, "doc_id", "payload", 4).collect()
    assert(a.map(_.id).sorted === Array(1L, 2L))
    assert(a.map(i => (i.id, i.width, i.height, i.features.toSeq)).toSet ===
      b.map(i => (i.id, i.width, i.height, i.features.toSeq)).toSet)
    assert(a.forall(_.features.length === 4))
  }

  test("BMP codec: encode/parse roundtrip covers strides, signed " +
      "height, padding exclusion, and non-BMP rejection") {
    // width 1..8 exercises every pad width (w*3 mod 4 = 3,2,1,0,...)
    for (w <- 1 to 8; h <- Seq(1, 3); topDown <- Seq(false, true)) {
      val fill = (w * 41 + h) % 251
      val bytes = Multimodal.encodeBmp(w, h, fill, topDown)
      val info = Multimodal.parseBmp(bytes).getOrElse(
        fail(s"valid BMP ${w}x$h topDown=$topDown did not parse"))
      assert(info.width === w)
      assert(info.height === h)
      assert(info.bpp === 24)
      assert(info.topDown === topDown)
      // padding bytes are 0xAB: a sum that included them would exceed this
      assert(info.pixelSum === w.toLong * h * 3 * fill,
        s"pixel sum must exclude row padding (${w}x$h)")
    }
    // rejection: too short, wrong magic, truncated pixel array
    assert(Multimodal.parseBmp(null).isEmpty)
    assert(Multimodal.parseBmp(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.parseBmp("not a bitmap at all, just text padding"
      .getBytes("UTF-8")).isEmpty)
    val truncated = Multimodal.encodeBmp(8, 8, 7, topDown = false).take(100)
    assert(Multimodal.parseBmp(truncated).isEmpty,
      "truncated pixel array must be rejected, not over-read")
    // adversarial width whose w*3 overflows Int: the stride would wrap
    // negative and slip past the Long bounds check — must reject, not
    // crash the task on an out-of-bounds read
    val evil = Multimodal.encodeBmp(4, 1, 7, topDown = false)
    java.nio.ByteBuffer.wrap(evil)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(18, 715827883)
    assert(Multimodal.parseBmp(evil).isEmpty,
      "overflowing width must be rejected")
    // column expressions: decode(encode(...)) over a DataFrame
    val df = spark.range(1, 50).select(col("id"),
      Multimodal.bmpEncode((lit(1) + col("id") % 13).cast("int"),
        (lit(1) + col("id") % 7).cast("int"), (col("id") % 251).cast("int"),
        col("id") % 2 === 0).as("payload"))
    val decoded = df.select(col("id"),
        Multimodal.bmpDecode(col("payload")).as("img"))
      .select(col("id"), col("img.width"), col("img.height"),
        col("img.pixel_sum")).as[(Long, Int, Int, Long)].collect()
    decoded.foreach { case (id, w, h, sum) =>
      assert(w === 1 + (id % 13).toInt && h === 1 + (id % 7).toInt)
      assert(sum === w.toLong * h * 3 * (id % 251))
    }
    // decodeImages routes real BMPs natively, opaque payloads to the stub
    val mixed = Seq(
      (1L, Multimodal.encodeBmp(5, 4, 10, topDown = false)),
      (2L, "opaque jpeg-ish bytes".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val imgs = Multimodal.decodeImages(mixed, "doc_id", "payload", 4)
      .collect().map(i => i.id -> i).toMap
    assert(imgs(1L).width === 5 && imgs(1L).height === 4,
      "BMP payload must decode through the real parser")
    assert(imgs(2L).width !== 0, "opaque payload must fall back to stub")
  }

  test("WAV codec: ramp encode/parse roundtrip, chunk-walker hardening, " +
      "and non-WAV rejection") {
    def rampSum(channels: Int, frames: Int, seed: Int): Long =
      (0L until channels.toLong * frames)
        .map(k => (seed + k) % 65536 - 32768).sum
    for (ch <- Seq(1, 2, 3); fr <- Seq(1, 9, 40); seed <- Seq(0, 7, 65520)) {
      val info = Multimodal.parseWav(
        Multimodal.encodeWav(ch, 8000, fr, seed)).getOrElse(
        fail(s"valid WAV ch=$ch frames=$fr seed=$seed did not parse"))
      assert(info.channels === ch && info.sampleRate === 8000 &&
        info.bits === 16 && info.nFrames === fr)
      // the wrapping ramp makes the sum position-dependent: only a real
      // sample walk reproduces it (seed 65520 exercises the wrap)
      assert(info.sampleSum === rampSum(ch, fr, seed))
    }
    assert(Multimodal.parseWav(null).isEmpty)
    assert(Multimodal.parseWav(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.parseWav(
      ("RIFFxxxxNOPE" + "y" * 40).getBytes("US-ASCII")).isEmpty)
    val truncated = Multimodal.encodeWav(2, 8000, 40, 7).take(60)
    assert(Multimodal.parseWav(truncated).isEmpty,
      "truncated data chunk must be rejected, not over-read")
    // adversarial chunk length near Int.MaxValue: Int arithmetic would
    // wrap the bounds check negative and read out of bounds
    val evil = Multimodal.encodeWav(1, 8000, 4, 7)
    java.nio.ByteBuffer.wrap(evil)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, Int.MaxValue - 4)
    assert(Multimodal.parseWav(evil).isEmpty,
      "overflowing chunk length must be rejected")
    // the three native parsers cannot shadow each other
    assert(Multimodal.parseWav(
      Multimodal.encodeBmp(4, 4, 9, topDown = false)).isEmpty)
    assert(Multimodal.parseBmp(Multimodal.encodeWav(1, 8000, 4, 7)).isEmpty)
    assert(Multimodal.parsePng(Multimodal.encodeWav(1, 8000, 4, 7)).isEmpty)
    // column expressions: decode(encode(...)) over a DataFrame
    val decoded = spark.range(1, 50).select(col("id"),
        Multimodal.wavDecode(Multimodal.wavEncode(
          (lit(1) + col("id") % 2).cast("int"), lit(8000),
          (lit(1) + col("id") % 9).cast("int"),
          (col("id") % 65521).cast("int"))).as("au"))
      .select(col("id"), col("au.channels"), col("au.n_frames"),
        col("au.sample_sum")).as[(Long, Int, Long, Long)].collect()
    decoded.foreach { case (id, ch, fr, sum) =>
      assert(ch === 1 + (id % 2).toInt && fr === 1 + (id % 9))
      assert(sum === rampSum(ch, fr.toInt, (id % 65521).toInt))
    }
  }

  test("PNG codec: gradient encode/decode roundtrip, non-PNG rejection, " +
      "and native routing in decodeImages") {
    def gradSum(w: Int, h: Int, fill: Int): Long =
      (for (x <- 0 until w; y <- 0 until h)
        yield 3L * ((fill + x + y) % 256)).sum
    for (w <- Seq(1, 3, 8); h <- Seq(1, 5)) {
      val fill = (w * 41 + h) % 251
      val info = Multimodal.parsePng(Multimodal.encodePng(w, h, fill))
        .getOrElse(fail(s"valid PNG ${w}x$h did not parse"))
      assert(info.width === w && info.height === h)
      // the gradient makes the sum position-dependent: only a real
      // inflate + per-pixel reconstruction reproduces it
      assert(info.pixelSum === gradSum(w, h, fill))
    }
    assert(Multimodal.parsePng(null).isEmpty)
    assert(Multimodal.parsePng(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.parsePng(
      "not a png, correct length though".getBytes("UTF-8")).isEmpty)
    val truncated = Multimodal.encodePng(8, 8, 7).take(40)
    assert(Multimodal.parsePng(truncated).isEmpty,
      "truncated PNG must be rejected, not crash the decode")
    // an adversarial IHDR declaring a huge frame must be rejected
    // BEFORE ImageIO allocates it (executor-OOM guard, not decode)
    val evil = Multimodal.encodePng(4, 4, 9)
    val ebb = java.nio.ByteBuffer.wrap(evil)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    ebb.putInt(16, 60000)
    ebb.putInt(20, 60000)
    assert(Multimodal.parsePng(evil).isEmpty,
      "oversized IHDR dimensions must be rejected pre-allocation")
    // a BMP payload is not a PNG and vice versa — the two native
    // parsers cannot shadow each other
    assert(Multimodal.parsePng(
      Multimodal.encodeBmp(4, 4, 9, topDown = false)).isEmpty)
    assert(Multimodal.parseBmp(Multimodal.encodePng(4, 4, 9)).isEmpty)
    // column expressions: decode(encode(...)) over a DataFrame
    val decoded = spark.range(1, 50).select(col("id"),
        Multimodal.pngDecode(Multimodal.pngEncode(
          (lit(1) + col("id") % 13).cast("int"),
          (lit(1) + col("id") % 7).cast("int"),
          (col("id") % 251).cast("int"))).as("img"))
      .select(col("id"), col("img.width"), col("img.height"),
        col("img.pixel_sum")).as[(Long, Int, Int, Long)].collect()
    decoded.foreach { case (id, w, h, sum) =>
      assert(w === 1 + (id % 13).toInt && h === 1 + (id % 7).toInt)
      assert(sum === gradSum(w, h, (id % 251).toInt))
    }
    // decodeImages routes PNGs natively (dims from the real decode,
    // features from the decoded pixels), opaque payloads to the stub
    val mixed = Seq(
      (1L, Multimodal.encodePng(5, 4, 10)),
      (2L, "opaque jpeg-ish bytes".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val imgs = Multimodal.decodeImages(mixed, "doc_id", "payload", 4)
      .collect().map(i => i.id -> i).toMap
    assert(imgs(1L).width === 5 && imgs(1L).height === 4)
    // pixel (0,0) = (10+0+0) = 10 -> red channel 10/255
    assert(math.abs(imgs(1L).features(0) - 10f / 255f) < 1e-6f)
    assert(imgs(2L).width !== 0, "opaque payload must fall back to stub")
  }

  test("JPEG codec: block-solid fixture round-trips bit-exactly, " +
      "guards mirror the PNG path, decodeImages routes natively") {
    def blockSum(w: Int, h: Int, fill: Int): Long = {
      val wb = w / 8
      (for (by <- 0 until h / 8; bx <- 0 until wb)
        yield 192L * ((fill + 41 * (by * wb + bx)) % 256)).sum
    }
    for (w <- Seq(8, 24, 48); h <- Seq(8, 32)) {
      val fill = (w * 7 + h) % 251
      val info = Multimodal.parseJpeg(Multimodal.encodeJpeg(w, h, fill))
        .getOrElse(fail(s"valid JPEG ${w}x$h did not parse"))
      assert(info.width === w && info.height === h)
      // per-block values make the sum depend on every 8×8 block: only
      // a real entropy-decode + dequantize + IDCT reproduces it
      assert(info.pixelSum === blockSum(w, h, fill))
    }
    assert(Multimodal.parseJpeg(null).isEmpty)
    assert(Multimodal.parseJpeg(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.parseJpeg(
      "not a jpeg, correct length though".getBytes("UTF-8")).isEmpty)
    val valid = Multimodal.encodeJpeg(16, 8, 7)
    assert(Multimodal.jpegDims(valid) === Some((16, 8)),
      "SOF walk finds the frame header")
    assert(Multimodal.parseJpeg(valid.take(40)).isEmpty,
      "truncated JPEG must be rejected, not crash the decode")
    // an adversarial SOF declaring a huge frame must be rejected
    // BEFORE ImageIO allocates it — patch the SOF dims in place
    val sof = {
      var p = 2
      var at = -1
      while (at < 0 && p + 3 < valid.length) {
        val m = valid(p + 1) & 0xFF
        val len = ((valid(p + 2) & 0xFF) << 8) | (valid(p + 3) & 0xFF)
        if (m == 0xC0 || m == 0xC1 || m == 0xC2) at = p
        else p += 2 + len
      }
      at
    }
    assert(sof > 0, "fixture JPEG has an SOF marker")
    val evil = valid.clone()
    evil(sof + 5) = 0xEA.toByte; evil(sof + 6) = 0x60.toByte // h = 60000
    evil(sof + 7) = 0xEA.toByte; evil(sof + 8) = 0x60.toByte // w = 60000
    assert(Multimodal.parseJpeg(evil).isEmpty,
      "oversized SOF dimensions must be rejected pre-allocation")
    // the format parsers cannot shadow each other
    assert(Multimodal.parseJpeg(Multimodal.encodePng(4, 4, 9)).isEmpty)
    assert(Multimodal.parsePng(valid).isEmpty)
    assert(Multimodal.parseBmp(valid).isEmpty)
    // column expressions + SQL registration
    val decoded = spark.range(1, 50).select(col("id"),
        Multimodal.jpegDecode(Multimodal.jpegEncode(
          (lit(8) * (lit(1) + col("id") % 6)).cast("int"),
          (lit(8) * (lit(1) + col("id") % 4)).cast("int"),
          (col("id") % 251).cast("int"))).as("img"))
      .select(col("id"), col("img.width"), col("img.height"),
        col("img.pixel_sum")).as[(Long, Int, Int, Long)].collect()
    decoded.foreach { case (id, w, h, sum) =>
      assert(w === 8 * (1 + (id % 6).toInt) && h === 8 * (1 + (id % 4).toInt))
      assert(sum === blockSum(w, h, (id % 251).toInt))
    }
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      """SELECT img.pixel_sum FROM (
        |  SELECT graft_jpeg_decode(graft_jpeg_encode(16, 8, 5)) AS img
        |)""".stripMargin).as[Long].head()
    assert(viaSql === blockSum(16, 8, 5))
    // decodeImages routes JPEGs natively
    val mixed = Seq((1L, Multimodal.encodeJpeg(8, 8, 60)))
      .toDF("doc_id", "payload")
    val imgs2 = Multimodal.decodeImages(mixed, "doc_id", "payload", 4)
      .collect().map(i => i.id -> i).toMap
    assert(imgs2(1L).width === 8 && imgs2(1L).height === 8)
    // block 0 is solid 60 -> red channel 60/255
    assert(math.abs(imgs2(1L).features(0) - 60f / 255f) < 1e-6f)
  }

  test("GIF codec: indexed-gray gradient round-trips losslessly " +
      "(non-interlaced; row order exact), guards reject non-GIFs") {
    def gradSum(w: Int, h: Int, fill: Int): Long =
      (for (y <- 0 until h; x <- 0 until w)
        yield 3L * ((fill + x + y) % 256)).sum
    // heights that hit the interlace-pass boundaries (the JDK writer's
    // default interlaced mode scrambles rows 1-2 on its own reader —
    // this pins the MODE_DISABLED fix)
    for (w <- Seq(1, 2, 4, 11); h <- Seq(1, 2, 3, 5, 9)) {
      val fill = (w * 31 + h) % 251
      val info = Multimodal.parseGif(Multimodal.encodeGif(w, h, fill))
        .getOrElse(fail(s"valid GIF ${w}x$h did not parse"))
      assert(info.width === w && info.height === h)
      assert(info.pixelSum === gradSum(w, h, fill),
        s"lossless round-trip broken at ${w}x$h")
    }
    assert(Multimodal.parseGif(null).isEmpty)
    assert(Multimodal.parseGif("GIF8".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parseGif(Multimodal.encodePng(4, 4, 9)).isEmpty)
    assert(Multimodal.parseGif(Multimodal.encodeJpeg(8, 8, 9)).isEmpty)
    assert(Multimodal.parsePng(Multimodal.encodeGif(4, 4, 9)).isEmpty)
    val valid = Multimodal.encodeGif(5, 4, 7)
    assert(Multimodal.gifDims(valid) === Some((5, 4)))
    // oversized LSD dims rejected pre-allocation
    val evil = valid.clone()
    evil(6) = 0xFF.toByte; evil(7) = 0xFF.toByte // w = 65535
    evil(8) = 0xFF.toByte; evil(9) = 0xFF.toByte // h = 65535
    assert(Multimodal.parseGif(evil).isEmpty)
    // SQL registration
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      """SELECT img.pixel_sum FROM (
        |  SELECT graft_gif_decode(graft_gif_encode(6, 3, 5)) AS img
        |)""".stripMargin).as[Long].head()
    assert(viaSql === gradSum(6, 3, 5))
    // decodeImages routes GIFs natively
    val mixed = Seq((1L, Multimodal.encodeGif(8, 8, 60)))
      .toDF("doc_id", "payload")
    val imgs = Multimodal.decodeImages(mixed, "doc_id", "payload", 4)
      .collect().map(i => i.id -> i).toMap
    assert(imgs(1L).width === 8 && imgs(1L).height === 8)
    assert(math.abs(imgs(1L).features(0) - 60f / 255f) < 1e-6f)
  }

  test("animated GIF: every frame round-trips losslessly with its own " +
      "shifted gradient; caps and guards hold") {
    def gradSum(w: Int, h: Int, fill: Int, f: Int): Long =
      (for (y <- 0 until h; x <- 0 until w)
        yield 3L * ((fill + 7 * f + x + y) % 256)).sum
    val bytes = Multimodal.encodeGifAnim(6, 5, 40, 3)
    val frames = Multimodal.parseGifFrames(bytes)
      .getOrElse(fail("animated GIF did not parse"))
    assert(frames.length === 3)
    frames.zipWithIndex.foreach { case (g, f) =>
      assert(g.width === 6 && g.height === 5)
      assert(g.pixelSum === gradSum(6, 5, 40, f), s"frame $f")
    }
    // single-frame animation == plain GIF decode
    val one = Multimodal.parseGifFrames(Multimodal.encodeGif(4, 4, 9))
    assert(one.get.length === 1)
    assert(one.get.head.pixelSum ===
      Multimodal.parseGif(Multimodal.encodeGif(4, 4, 9)).get.pixelSum)
    // frame cap and guards
    assert(Multimodal.parseGifFrames(
      Multimodal.encodeGifAnim(2, 2, 0, 5), maxFrames = 2).get.length === 2)
    assert(Multimodal.parseGifFrames("not a gif".getBytes("UTF-8")).isEmpty)
    intercept[IllegalArgumentException] {
      Multimodal.encodeGifAnim(2, 2, 0, 0)
    }
  }

  test("filteredBruteTopK: only same-label candidates score, equals " +
      "brute force over the filtered subset, self excluded") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), "a"), (1L, Array(0.9f, 0.1f), "a"),
      (2L, Array(0.0f, 1.0f), "a"), (3L, Array(1.0f, 0.05f), "b"),
      (4L, Array(0.5f, 0.5f), "b"), (5L, Array(0.95f, 0.0f), "a"))
      .toDF("vec_id", "embedding", "label")
    val q = vecs.where(col("vec_id") === 0L)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        col("label").as("qlabel"))
    val got = Similarity.filteredBruteTopK(vecs, "vec_id", "embedding",
      "label", q, "qid", "qv", "qlabel", 10)
      .select("vec_id", "label", "rank")
      .as[(Long, String, Int)].collect().toSeq.sortBy(_._3)
    // label-a corpus minus self: {1, 2, 5}; cosine order 5 ~ 1 > 2
    assert(got.map(_._1) === Seq(5L, 1L, 2L))
    assert(got.forall(_._2 === "a"), "a 'b' row scored past the filter")
    // equals unfiltered brute force over the pre-filtered corpus
    val ref = Similarity.bruteForceTopK(vecs.where(col("label") === "a"),
      "vec_id", "embedding", q.drop("qlabel"), "qid", "qv", 10)
      .select("vec_id", "rank").as[(Long, Int)].collect().toSeq.sorted
    assert(got.map(r => (r._1, r._3)).sorted === ref)
  }

  test("PNG dHash: straight-line reference over gradients, rescale " +
      "invariance on exact multiples, non-PNG rejection") {
    def refHash(w: Int, h: Int, fill: Int): (Long, Long, Int) = {
      def gray(x: Int, y: Int): Int = (fill + x * w / 9 + y * h / 8) % 256
      var hi = 0L; var lo = 0L; var n = 0
      for (y <- 0 until 8; x <- 0 until 8
          if gray(x + 1, y) > gray(x, y)) {
        n += 1
        val k = y * 8 + x
        if (k < 32) hi |= 1L << (31 - k) else lo |= 1L << (63 - k)
      }
      (hi, lo, n)
    }
    for ((w, h) <- Seq((13, 7), (9, 8), (1, 1), (20, 16))) {
      val fill = (w * 19 + h) % 251
      val got = Multimodal.pngDhash(Multimodal.encodePng(w, h, fill))
        .getOrElse(fail(s"valid PNG ${w}x$h did not hash"))
      assert(got === refHash(w, h, fill), s"dims ${w}x$h")
    }
    // a wrap-free 9x8 gradient brightens at every step: all 64 bits.
    // Near the 255->0 wrap some comparisons flip: strictly fewer bits.
    // A +1 brightness shift away from the wrap changes nothing.
    val base = Multimodal.pngDhash(Multimodal.encodePng(9, 8, 100)).get
    assert(base._3 === 64, "wrap-free gradient brightens everywhere")
    assert(Multimodal.pngDhash(Multimodal.encodePng(9, 8, 101)).get
      === base, "uniform brightness shift must not change the hash")
    val wrapped = Multimodal.pngDhash(Multimodal.encodePng(9, 8, 250)).get
    assert(wrapped._3 > 0 && wrapped._3 < 64,
      "the 255->0 wrap must clear some gradient bits")
    assert(Multimodal.pngDhash(null: Array[Byte]).isEmpty)
    assert(Multimodal.pngDhash("nope".getBytes("UTF-8")).isEmpty)
    // column expression: null routing + struct fields
    val df = Seq((1L, Multimodal.encodePng(13, 7, 42)),
      (2L, "opaque".getBytes("UTF-8"))).toDF("id", "payload")
      .select(col("id"), Multimodal.pngDhashCol(col("payload")).as("ph"))
      .select(col("id"), col("ph.dhash_hi"), col("ph.dhash_lo"),
        col("ph.n_set"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val want = refHash(13, 7, 42)
    assert(df(1L).getLong(1) === want._1 && df(1L).getLong(2) === want._2)
    assert(df(1L).getInt(3) === want._3)
    assert(df(2L).isNullAt(1) && df(2L).isNullAt(3))
  }

  test("PNG NN-resize samples ⌊x·w/w2⌋ exactly; guards mirror the decoder") {
    def nnSum(w: Int, h: Int, fill: Int, w2: Int, h2: Int): Long =
      (for (x <- 0 until w2; y <- 0 until h2)
        yield 3L * ((fill + x * w / w2 + y * h / h2) % 256)).sum
    // down- and up-scale, identity, and 1-pixel extremes
    for ((w, h, w2, h2) <- Seq((8, 5, 3, 2), (2, 2, 7, 5), (4, 3, 4, 3),
        (6, 6, 1, 1), (1, 1, 4, 4))) {
      val fill = (w * 37 + h * 11 + w2) % 251
      val info = Multimodal
        .resizePngNn(Multimodal.encodePng(w, h, fill), w2, h2)
        .getOrElse(fail(s"resize ${w}x$h -> ${w2}x$h2 did not decode"))
      assert(info.width === w2 && info.height === h2)
      assert(info.pixelSum === nnSum(w, h, fill, w2, h2))
    }
    // identity resize == plain decode
    val bytes = Multimodal.encodePng(9, 4, 17)
    assert(Multimodal.resizePngNn(bytes, 9, 4).get.pixelSum ===
      Multimodal.parsePng(bytes).get.pixelSum)
    // non-PNG payloads and unallocatable targets are null, not errors
    assert(Multimodal.resizePngNn("nope".getBytes("UTF-8"), 2, 2).isEmpty)
    assert(Multimodal.resizePngNn(bytes, 0, 2).isEmpty)
    assert(Multimodal.resizePngNn(bytes, 1 << 15, 1 << 15).isEmpty,
      "oversized TARGET dims must be rejected pre-allocation")
    // the column expression routes nulls and non-PNGs to null rows
    val out = Seq(
      (1L, Multimodal.encodePng(5, 4, 10)),
      (2L, "opaque".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
      .select(col("doc_id"), Multimodal.pngResize(col("payload"),
        lit(2), lit(3)).as("img"))
      .select(col("doc_id"), col("img.width"), col("img.pixel_sum"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getLong(2)))))
      .toMap
    assert(out(1L) === Some((2, nnSum(5, 4, 10, 2, 3))))
    assert(out(2L).isEmpty)
  }

  test("frame sampling emits n deterministic frames per doc") {
    val bin = Multimodal.attachBinary(
      Seq((1L, "some video payload bytes")).toDF("doc_id", "text"), "text", "video")
    val frames = Multimodal.sampleFrames(bin, "doc_id", "payload", 4).collect()
    assert(frames.length === 4)
    assert(frames.map(_.getInt(1)).sorted === Array(0, 1, 2, 3))
  }

  test("distributed IVF training is bit-identical under repartitioning " +
      "and feeds ivfTopK to an exact exhaustive-probe result") {
    val dim = 8
    val rows = spark.range(200).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (shiftrightunsigned(xxhash64(col("id") * dim + i), 11)
          .cast("double") / (1L << 53).toDouble) - 0.5).as("v"))
    // decimal-exact mean updates => partition layout cannot change the
    // trained model in even the last ulp
    val a = Similarity.trainIvfCentroidsDistributed(
      rows.repartition(3), "id", "v", nlist = 8, iters = 3)
    val b = Similarity.trainIvfCentroidsDistributed(
      rows.repartition(13), "id", "v", nlist = 8, iters = 3)
    assert(a.length === 8 && b.length === 8)
    (a zip b).zipWithIndex.foreach { case ((ca, cb), i) =>
      assert(ca.toSeq === cb.toSeq, s"centroid $i differs across layouts")
    }
    // exhaustive probe over the distributed-trained quantizer == brute
    // force (the same invariant sim3 pins for the sample-trained one)
    val q = rows.where(col("id") < 3)
      .select(col("id").as("qid"), col("v").as("qv"))
    val ivf = Similarity.ivfTopK(rows, "id", "v", q, "qid", "qv",
      k = 5, nlist = 8, nprobe = 8, pretrained = Some(a))
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(rows, "id", "v", q, "qid", "qv", 5)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    assert(ivf === brute)
  }

  test("semanticDedup: duplicate groups keep the min id; nlist=1 is " +
      "exact all-pairs; splitting cells never removes a survivor") {
    // at threshold 0.95 the near-parallel vectors {0, 1, 4} form one
    // group (cos(0,1)≈0.993, cos(0,4)≈0.99995); 2 and 3 are orthogonal
    val s1 = Dedup.semanticDedup(vecs, "vec_id", "embedding",
      threshold = 0.95, nlist = 1, iters = 1)
      .select("vec_id").as[Long].collect().toSet
    assert(s1 === Set(0L, 2L, 3L),
      "group {0,1,4} must collapse to its min id 0")
    // more cells can only MISS cross-cell pairs => groups split, and a
    // split group's min still survives — survivors grow monotonically
    val s4 = Dedup.semanticDedup(vecs, "vec_id", "embedding",
      threshold = 0.95, nlist = 4, iters = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(s1.subsetOf(s4), s"nlist=1 survivors $s1 not within $s4")
    // all columns of the surviving rows come back
    val cols = Dedup.semanticDedup(vecs, "vec_id", "embedding",
      threshold = 0.95, nlist = 1, iters = 1).columns.toSeq
    assert(cols === vecs.columns.toSeq)
  }

  test("semanticDedup property: nlist=1 survivors match a local " +
      "union-find reference on random vectors") {
    val rnd = new scala.util.Random(23)
    val dim = 6
    // planted near-dup structure: 20 base vectors, each echoed 0-3
    // times with tiny jitter, plus noise vectors
    val data = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
    var id = 0L
    for (_ <- 0 until 20) {
      val base = Array.fill(dim)(rnd.nextDouble() - 0.5)
      data += ((id, base)); id += 1
      for (_ <- 0 until rnd.nextInt(4)) {
        data += ((id, base.map(_ + (rnd.nextDouble() - 0.5) * 0.01))); id += 1
      }
    }
    for (_ <- 0 until 30) { // standalone noise: likely-singleton rows
      data += ((id, Array.fill(dim)(rnd.nextDouble() - 0.5))); id += 1
    }
    val threshold = 0.98
    // local reference: exact cosine (same sequential-fold formula as
    // CosineSim), pairs >= threshold, union-by-min transitive closure
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) { dot += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val parent = scala.collection.mutable.Map(
      data.map(d => d._1 -> d._1).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (i <- data.indices; j <- (i + 1) until data.size
        if cos(data(i)._2, data(j)._2) >= threshold) {
      val (ri, rj) = (find(data(i)._1), find(data(j)._1))
      if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
    }
    val want = data.map(_._1).filter(x => find(x) == x).toSet
    val got = Dedup.semanticDedup(
      data.toSeq.toDF("vec_id", "embedding"), "vec_id", "embedding",
      threshold = threshold, nlist = 1, iters = 1)
      .select("vec_id").as[Long].collect().toSet
    assert(got === want)
  }

  test("semanticDedup hot-cell guard: a cell holding half the corpus " +
      "emits O(B) chain pairs, not B², and survivors are unchanged for " +
      "a near-duplicate cluster") {
    // adversarial shape: 100 near-identical vectors (boilerplate corpus
    // — they all land in ONE k-means cell no matter the nlist) plus 100
    // PROVABLY mutually-orthogonal singletons (one-hot axes), so the
    // expected survivor set is certain: {0} ∪ {100..199}
    val dim = 100
    val hot = (0L until 100L).map(i =>
      (i, Array.fill(dim)(1.0 + i * 1e-6))) // scalar multiples: cosine = 1
    val spread = (100L until 200L).map { i =>
      val v = new Array[Double](dim)
      v((i - 100L).toInt) = (i - 99L).toDouble // one-hot: pairwise cos 0
      (i, v)
    }
    val df = (hot ++ spread).toDF("vec_id", "embedding")
    val oneCell = df.select(col("vec_id"), col("embedding"))
      .withColumn("__cell", lit(0))
    // uncapped all-pairs inside the hot cluster: 100*99/2 = 4950 pairs
    val uncapped = Dedup.semanticPairs(oneCell, "vec_id", "embedding",
      threshold = 0.999, maxCellSize = Int.MaxValue).count()
    assert(uncapped >= 4950L, s"expected >= 4950 uncapped pairs, got $uncapped")
    // capped: the 200-row cell chain-pairs — at most B-1 = 199 verified
    // pairs ever materialize (linear, the 100 TB-survivable bound)
    val capped = Dedup.semanticPairs(oneCell, "vec_id", "embedding",
      threshold = 0.999, maxCellSize = 10).count()
    assert(capped <= 199L, s"chain pairing must emit O(B) pairs, got $capped")
    // end-to-end: the chain keeps the near-dup cluster connected, so
    // capped survivors == uncapped survivors (hot cluster -> min id 0;
    // every spread vector survives as a singleton)
    val full = Dedup.semanticDedup(df, "vec_id", "embedding",
      threshold = 0.999, nlist = 1, iters = 1)
      .select("vec_id").as[Long].collect().toSet
    val guarded = Dedup.semanticDedup(df, "vec_id", "embedding",
      threshold = 0.999, nlist = 1, iters = 1, maxCellSize = 10)
      .select("vec_id").as[Long].collect().toSet
    assert(full === guarded,
      "hot-cell chain pairing must not change survivors for a " +
        "near-duplicate cluster")
    assert(guarded.contains(0L) && !guarded.exists(id => id > 0 && id < 100),
      "hot cluster must collapse to min id 0")
  }

  test("distributed PQ training is repartition-invariant and " +
      "reconstructs a <=ksub-distinct corpus exactly") {
    // subvector values drawn from 4 binary-and-decimal-exact patterns per
    // subspace, so distinct-init covers the space and the fixed point of
    // Lloyd's is exact reconstruction
    val pats = Array(
      Array(0.25, -0.5, 1.0, 0.0),
      Array(1.0, 0.25, -0.25, 0.5),
      Array(-0.5, 0.0, 0.25, 1.0),
      Array(0.5, 1.0, 0.0, -0.25))
    val data = (0 until 100).map { i =>
      (i.toLong, pats(i % 4) ++ pats((i / 4) % 4))
    }
    val rows = data.toDF("id", "v")
    val a = Similarity.trainPqCodebooksDistributed(
      rows.repartition(3), "id", "v", m = 2, ksub = 4, iters = 3)
    val b = Similarity.trainPqCodebooksDistributed(
      rows.repartition(7), "id", "v", m = 2, ksub = 4, iters = 3)
    assert(a.length === 2 && a.forall(_.length === 4))
    (a zip b).zipWithIndex.foreach { case ((ba, bb), j) =>
      (ba zip bb).foreach { case (ca, cb) =>
        assert(ca.toSeq === cb.toSeq, s"subspace $j differs across layouts")
      }
    }
    // decode(encode(v)) == v for every row: the codebooks converged on
    // the exact pattern set
    val bad = rows.select(col("v"),
        Similarity.pqDecode(Similarity.pqEncode(col("v"), a), a).as("r"))
      .where(col("v") =!= col("r"))
    assert(bad.count() === 0, "distributed-trained PQ must reconstruct " +
      "a <=ksub-distinct corpus exactly")
  }

  test("IVF at nlist=4096: trains past the plan-literal cap, assignment " +
      "takes the broadcast-variable path, and matches the per-task path") {
    val dim = 32
    val rows = spark.range(5000).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (shiftrightunsigned(xxhash64(col("id") * dim + i), 11)
          .cast("double") / (1L << 53).toDouble) - 0.5).as("v"))
    val cents = Similarity.trainIvfCentroids(rows, "id", "v",
      nlist = 4096, iters = 2)
    assert(cents.length === 4096, "sample must be widened to cover nlist")

    // 4096 × 32 doubles crosses the threshold -> auto must pick broadcast
    assert(4096L * dim >= Similarity.BroadcastCentroidDoubles)
    val auto = Similarity.topCellsAuto(col("v"), cents, 1)
    val bcNodes = rows.select(auto.as("c")).queryExecution.analyzed
      .expressions.flatMap(_.collect {
        case t: graft.functions.GraftFunctions.TopCells => t
      })
    assert(bcNodes.nonEmpty && bcNodes.forall(_.bcCentroids.isDefined),
      "large codebook must ride a broadcast variable, not the expression")

    // parity: broadcast path == expression-object path on every row
    val both = rows.select(
      element_at(graft.functions.GraftFunctions
        .topCells(col("v"), cents, 1), 1).as("small"),
      element_at(auto, 1).as("bc"))
      .where(col("small") =!= col("bc"))
    assert(both.count() === 0, "paths disagree on some rows")

    // every assignment is a valid cell id
    val rng = rows.select(element_at(auto, 1).as("c"))
      .agg(min(col("c")), max(col("c"))).head
    assert(rng.getInt(0) >= 0 && rng.getInt(1) < 4096)
  }

  test("ndcgAtK: a perfect ranking scores exactly 1.0, and the " +
    "discount table matches round(1/log2(i+1), 6)") {
    val truth = Seq(
      (1L, 10L, 0.9, 1), (1L, 11L, 0.8, 2), (1L, 12L, 0.7, 3))
      .toDF("qid", "vec_id", "sim", "rank")
    val r = Similarity.ndcgAtK(truth, truth, "qid", "vec_id", "sim", 3)
      .select("dcg", "idcg", "ndcg").as[(Double, Double, Double)].head()
    // dcg == idcg as EXACT decimals -> the division is exactly 1.0
    assert(r._1 === r._2)
    assert(r._3 === 1.0)
    val w = Similarity.dcgWeights(3).map(_.doubleValue)
    assert(w(0) === 1.0)
    assert(math.abs(w(1) - 1.0 / (math.log(3) / math.log(2))) < 1e-6)
    assert(r._2 === 0.9 * w(0) + 0.8 * w(1) + 0.7 * w(2))
  }

  test("ndcgAtK: swapped top-2 and an out-of-pool pick score the " +
    "hand-computed value") {
    val truth = Seq(
      (1L, 10L, 0.5, 1), (1L, 11L, 0.25, 2))
      .toDF("qid", "vec_id", "sim", "rank")
    // approx: truth#2 first, then a doc OUTSIDE the pool (rel 0)
    val approx = Seq((1L, 11L, 0.99, 1), (1L, 99L, 0.98, 2))
      .toDF("qid", "vec_id", "sim", "rank")
    val r = Similarity.ndcgAtK(approx, truth, "qid", "vec_id", "sim", 2)
      .select("dcg", "idcg", "ndcg").as[(Double, Double, Double)].head()
    // weights: w1 = 1.000000, w2 = 0.630930
    assert(r._1 === 0.25 * 1.0) // rel(11)=0.25 at rank 1, rel 0 at rank 2
    assert(r._2 === 0.5 * 1.0 + 0.25 * 0.630930)
    assert(math.abs(r._3 - r._1 / r._2) < 1e-12)
  }

  test("ndcgAtK: relevance comes from the pool, not the approx scores") {
    val truth = Seq((1L, 10L, 0.5, 1)).toDF("qid", "vec_id", "sim", "rank")
    // approx claims a wild similarity — ndcg must ignore it
    val approx = Seq((1L, 10L, 123.0, 1)).toDF("qid", "vec_id", "sim", "rank")
    val n = Similarity.ndcgAtK(approx, truth, "qid", "vec_id", "sim", 1)
      .select("ndcg").as[Double].head()
    assert(n === 1.0)
  }
}
