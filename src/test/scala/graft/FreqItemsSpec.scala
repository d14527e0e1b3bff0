package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Misra-Gries frequent-items aggregate: exactness when capacity covers
  * the domain, certified error bounds under pressure, mergeability
  * across partition layouts, SQL registration.
  */
class FreqItemsSpec extends SparkTestBase {
  import spark.implicits._

  // zipf-ish stream: item i appears ~ 2000/i times, 1 <= i <= 50
  private lazy val stream: Seq[String] =
    (1 to 50).flatMap(i => Seq.fill(2000 / i)(s"item$i"))
  private lazy val trueCounts: Map[String, Long] =
    stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def sketch(capacity: Int, parts: Int): Map[String, (Long, Long)] = {
    stream.toDF("x").repartition(parts)
      .agg(GraftFunctions.freqItems(col("x"), capacity).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select("e.item", "e.count_lb", "e.max_err")
      .as[(String, Long, Long)].collect()
      .map { case (i, c, d) => i -> (c, d) }.toMap
  }

  test("capacity >= distinct items => exact counts, zero error") {
    for (parts <- Seq(1, 7)) {
      val got = sketch(capacity = 64, parts)
      assert(got.map { case (k, (c, _)) => k -> c } === trueCounts)
      assert(got.values.forall(_._2 === 0L), "no decrement may ever fire")
    }
  }

  test("under pressure: certified bounds bracket the truth, delta <= n/(c+1)") {
    val n = stream.size.toLong
    for (parts <- Seq(1, 7); cap <- Seq(8, 16)) {
      val got = sketch(cap, parts)
      assert(got.size <= cap)
      val delta = got.values.map(_._2).max
      assert(delta <= n / (cap + 1),
        s"cap=$cap parts=$parts: delta $delta > n/(cap+1)")
      got.foreach { case (item, (lb, d)) =>
        val truth = trueCounts(item)
        assert(lb <= truth && truth <= lb + d,
          s"cap=$cap parts=$parts: $item lb=$lb d=$d truth=$truth")
      }
      // every item with frequency > n/(cap+1) must be present
      trueCounts.filter(_._2 > n / (cap + 1)).keys.foreach { hh =>
        assert(got.contains(hh), s"cap=$cap parts=$parts lost heavy hitter $hh")
      }
    }
  }

  test("SQL surface: graft_freq_items registered via extensions") {
    stream.toDF("x").createOrReplaceTempView("freq_in")
    val top = spark.sql(
      """SELECT sk[0].item AS item, sk[0].count_lb AS c FROM
        |  (SELECT graft_freq_items(x, 64) AS sk FROM freq_in)""".stripMargin)
      .as[(String, Long)].collect().head
    assert(top === ("item1" -> 2000L))
  }

  test("streams: the sketch aggregates across micro-batches via the state store") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val agg = mem.toDF().toDF("x")
      .groupBy()
      .agg(GraftFunctions.freqItems(col("x"), 8).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select("e.item", "e.count_lb")
    val q = agg.writeStream.format("memory").queryName("freq_stream")
      .outputMode("complete").start()
    mem.addData("a", "a", "b")
    q.processAllAvailable()
    mem.addData("a", "c")
    q.processAllAvailable()
    val got = spark.table("freq_stream")
      .as[(String, Long)].collect().toMap
    q.stop()
    // counts accumulate ACROSS batches: the buffer round-trips through
    // the streaming state store between triggers
    assert(got === Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
  }

  test("property: MG invariants hold on random streams × capacities × layouts") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 10) {
      // random skew: a few hot items over a random-size cold tail
      val hot = (1 to 3).flatMap(i =>
        Seq.fill(50 + rnd.nextInt(300))(s"hot$i"))
      val cold = Seq.fill(rnd.nextInt(400))(s"cold${rnd.nextInt(60)}")
      val data = rnd.shuffle(hot ++ cold)
      val truth = data.groupBy(identity)
        .map { case (k, v) => k -> v.size.toLong }
      val n = data.size.toLong
      val cap = 4 + rnd.nextInt(28)
      val parts = 1 + rnd.nextInt(8)
      val got = data.toDF("x").repartition(parts)
        .agg(GraftFunctions.freqItems(col("x"), cap).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select("e.item", "e.count_lb", "e.max_err")
        .as[(String, Long, Long)].collect()
      assert(got.length <= cap, s"trial $trial: size ${got.length} > $cap")
      got.foreach { case (item, lb, d) =>
        assert(d <= n / (cap + 1), s"trial $trial: delta $d > n/(cap+1)")
        val tv = truth(item)
        assert(lb <= tv && tv <= lb + d,
          s"trial $trial cap=$cap parts=$parts: $item lb=$lb d=$d true=$tv")
      }
      val present = got.map(_._1).toSet
      truth.filter(_._2 > n / (cap + 1)).keys.foreach { hh =>
        assert(present(hh),
          s"trial $trial cap=$cap parts=$parts lost heavy hitter $hh")
      }
    }
  }

  test("nulls are skipped, empty input yields an empty summary") {
    val got = Seq[Option[String]](None, Some("a"), None, Some("a"))
      .toDF("x")
      .agg(GraftFunctions.freqItems(col("x"), 4).as("sk"))
      .select(explode(col("sk")).as("e")).select("e.item", "e.count_lb")
      .as[(String, Long)].collect().toSeq
    assert(got === Seq("a" -> 2L))
    val empty = spark.emptyDataset[String].toDF("x")
      .agg(GraftFunctions.freqItems(col("x"), 4).as("sk"))
      .select(size(col("sk"))).as[Int].collect().head
    assert(empty === 0)
  }
}
