package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IntervalJoin, Multimodal, Quality, Similarity}

/** Regression coverage for the review-driven hardening fixes: empty
  * inputs, null/dirty rows, misuse guards.
  */
class HardeningSpec extends SparkTestBase {
  import spark.implicits._

  test("quality gate passes trivially on an empty batch") {
    val empty = Seq.empty[(Long, String)].toDF("id", "v")
    Quality.enforce(empty, Seq(Quality.notNull("id"),
      Quality.matches("v", "^[a-z]+$"))) // must not throw
    val row = Quality.check(empty, Seq(Quality.notNull("id"))).head
    assert(row.getLong(0) === 0L && row.getLong(1) === 0L)
  }

  test("cosine of a zero vector is null even from non-nullable literals") {
    val r = spark.range(1).select(
      Similarity.cosine(typedlit(Seq(0.0, 0.0)), typedlit(Seq(1.0, 2.0)))
        .as("z"),
      Similarity.cosine(typedlit(Seq(1.0)), typedlit(Seq(1.0, 2.0)))
        .as("mismatch")).head
    assert(r.isNullAt(0), "zero vector must yield null")
    assert(r.isNullAt(1), "dim mismatch must yield null")
  }

  test("lshBucket: null vector yields null bucket; wrong dim raises") {
    val df = Seq(Option(Array(1.0, 2.0)), None).toDF("v")
    val got = df.select(Similarity.lshBucket(col("v"), dim = 2, bits = 4)
      .as("b")).collect()
    assert(!got(0).isNullAt(0) && got(1).isNullAt(0))
    val bad = Seq(Array(1.0, 2.0, 3.0)).toDF("v")
    intercept[Exception] {
      bad.select(Similarity.lshBucket(col("v"), dim = 2, bits = 4)).collect()
    }
  }

  test("decodeImages drops null ids instead of failing the decode") {
    val df = Seq((Option(1L), "a"), (Option.empty[Long], "b"))
      .toDF("doc_id", "text")
    val bin = Multimodal.attachBinary(df, "text", "image")
    val out = Multimodal.decodeImages(bin, "doc_id", "payload", 4).collect()
    assert(out.map(_.id).toSeq === Seq(1L))
  }

  test("sampleFrames rejects non-positive n") {
    val bin = Multimodal.attachBinary(Seq((1L, "x")).toDF("doc_id", "text"),
      "text", "video")
    intercept[IllegalArgumentException] {
      Multimodal.sampleFrames(bin, "doc_id", "payload", 0)
    }
  }

  test("grid interval join rejects outer joins and sentinel-wide intervals") {
    val p = Seq(("2024-05-01 00:10:00")).toDF("t")
      .select(col("t").cast("timestamp").as("t"))
    val iv = Seq(("2024-05-01 00:00:00", "9999-12-31 00:00:00"))
      .toDF("s", "e")
      .select(col("s").cast("timestamp").as("s"), col("e").cast("timestamp").as("e"))
    intercept[IllegalArgumentException] {
      IntervalJoin.pointInIntervalBucketed(p, iv, "t", "s", "e",
        widthMicros = 60000000L, joinType = "left_outer")
    }
    intercept[Exception] { // raise_error on the sentinel-wide interval
      IntervalJoin.pointInIntervalBucketed(p, iv, "t", "s", "e",
        widthMicros = 60000000L).collect()
    }
  }

  test("grid interval join drops null-bound and reversed intervals (not fatal)") {
    val p = Seq("2024-05-01 00:10:00").toDF("t")
      .select(col("t").cast("timestamp").as("t"))
    // one good interval, one null-end, one REVERSED (end decades before
    // start — the negative span must not bypass the cell cap and emit a
    // multi-million-cell descending sequence)
    val iv = Seq(
      ("2024-05-01 00:00:00", "2024-05-01 01:00:00"),
      ("2024-05-01 00:00:00", null),
      ("2024-05-01 00:00:00", "1900-01-01 00:00:00"))
      .toDF("s", "e")
      .select(col("s").cast("timestamp").as("s"), col("e").cast("timestamp").as("e"))
    val got = IntervalJoin.pointInIntervalBucketed(p, iv, "t", "s", "e",
      widthMicros = 60000000L, maxCellsPerInterval = 1000)
      .select(col("e")).collect()
    assert(got.length === 1 && got.head.getTimestamp(0).toString
      .startsWith("2024-05-01 01:00"))
  }

  test("auto() as-of: null equi keys behave identically across strategies") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val l = Seq((Some(1), ts("2024-05-01 00:10:00"), "a"),
      (None, ts("2024-05-01 00:10:00"), "b")).toDF("k", "time", "tag")
    val r = Seq((Some(1), ts("2024-05-01 00:00:00"), 10.0),
      (Option.empty[Int], ts("2024-05-01 00:00:00"), 99.0)).toDF("k", "time", "v")
    def run(threshold: Long) = graft.operators.AsOfJoin.auto(l, r,
      "time", "time", by = Seq(("k", "k")), valueCols = Seq(("v", "v")),
      broadcastThreshold = threshold)
      .select($"tag", $"v").as[(String, Option[Double])].collect().toSet
    // broadcast pick vs forced merge: same rows — the null-keyed left row
    // is unmatched (SQL null-rejecting equality) under BOTH
    val want = Set(("a", Some(10.0)), ("b", None))
    assert(run(Long.MaxValue) === want)
    assert(run(0L) === want)
  }

  test("pqEncode: a null ELEMENT yields null codes, not a fabricated vector") {
    val cb = Array.fill(2)(Array(Array(0.0, 0.0), Array(1.0, 1.0)))
    val df = Seq((1L, Seq[Option[Double]](Some(1.0), None, Some(1.0), Some(1.0))))
      .toDF("id", "v")
    val r = df.select(graft.functions.GraftFunctions
      .pqEncode(col("v"), cb).as("c")).head
    assert(r.isNullAt(0))
  }

  test("dedupStream includeEventTime=false collapses re-stamped re-deliveries") {
    import java.nio.file.Files
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("dedup_keys")
    Files.writeString(dir.resolve("e.csv"),
      """ts,k,v
        |2024-05-01 00:10:00,a,1.0
        |2024-05-01 00:10:30,a,1.0
        |2024-05-01 00:20:00,b,2.0
        |""".stripMargin)
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("k", StringType), StructField("v", DoubleType)))
    val stream = spark.readStream.option("header", "true")
      .schema(schema).csv(dir.toString)
    val deduped = graft.streaming.AvailableNowJobs.dedupStream(
      stream, "ts", Seq("k"), watermark = "1 hour", includeEventTime = false)
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_keys_out").start()
    q.processAllAvailable(); q.stop()
    // the 30-second-re-stamped 'a' duplicate is dropped on key alone
    val ks = spark.table("dedup_keys_out").select("k").as[String]
      .collect().sorted
    assert(ks === Array("a", "b"))
  }

  test("VersionedTable survives genuinely concurrent appends") {
    val t = java.nio.file.Files.createTempDirectory("vt_conc").toString + "/t"
    val threads = (0 until 4).map { tid =>
      new Thread(() => {
        for (i <- 0 until 5)
          graft.sources.VersionedTable.append(spark,
            Seq((tid * 100 + i, s"w$tid-$i")).toDF("k", "v"), t)
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val (v, _) = graft.sources.VersionedTable.latest(spark, t)
    assert(v === 20L, "every append must win exactly one version")
    val rows = graft.sources.VersionedTable.read(spark, t)
      .as[(Int, String)].collect().toSet
    assert(rows.size === 20, "no append may be lost or duplicated")
  }
}
