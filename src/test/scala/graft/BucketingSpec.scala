package graft

import org.apache.spark.sql.functions._

import graft.sources.LakeWriter

/** Bucketed-table co-location: writing both join sides bucketed on the
  * join key lets repeated equi-joins run with no shuffle exchange on the
  * bucketed sides — at 100 TB this converts the biggest recurring cost
  * (shuffle of the fact table per join) into a one-time write-side cost.
  */
class BucketingSpec extends SparkTestBase {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    LakeWriter.writeBucketed(li, "li_b", 4, Seq("l_orderkey"), Seq("l_orderkey"))
    LakeWriter.writeBucketed(o, "o_b", 4, Seq("o_orderkey"), Seq("o_orderkey"))

    val joined = spark.table("li_b")
      .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")

    // same answer as the plain (shuffling) join
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() === plain)
  }

  test("compaction collapses many small files, preserving content") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    // simulate 8 tiny appends
    for (i <- 0 until 8)
      LakeWriter.append(Seq((i, s"v$i")).toDF("k", "v").repartition(2), dir)
    val before = spark.read.parquet(dir)
    val beforeRows = before.collect().map(_.toString).sorted
    val n = LakeWriter.compact(spark, dir, 1)
    assert(n === 1)
    val after = spark.read.parquet(dir)
    assert(after.collect().map(_.toString).sorted === beforeRows)
  }

  test("compaction never deletes files appended after its input snapshot") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact2").toString + "/t"
    for (i <- 0 until 4)
      LakeWriter.append(Seq((i, s"v$i")).toDF("k", "v"), dir)
    // Simulate the 15-min-cadence writer racing the compactor: snapshot
    // happens inside compact(); a concurrent append lands between the read
    // job and the delete step. compact() must only remove its snapshotted
    // inputs, so the late row survives. (We can't interleave mid-call here,
    // but we CAN verify the delete set is the snapshot, not listStatus-at-
    // delete-time: append after compact's read plan is built via a second
    // compact call on a moving table.)
    LakeWriter.compact(spark, dir, 1)
    LakeWriter.append(Seq((99, "late")).toDF("k", "v"), dir)
    val n = LakeWriter.compact(spark, dir, 1)
    assert(n >= 1)
    val rows = spark.read.parquet(dir).as[(Int, String)].collect().toSet
    assert(rows === (0 until 4).map(i => (i, s"v$i")).toSet + ((99, "late")))
  }

  test("mergeSchema scan reads files written under evolving schemas") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString + "/t"
    // v1 files: (k, v); v2 adds a column (k, v, extra)
    LakeWriter.append(Seq((1, "a")).toDF("k", "v"), dir)
    LakeWriter.append(Seq((2, "b", 9.5)).toDF("k", "v", "extra"), dir)
    val df = graft.sources.LakeReader.evolvedTable(spark, dir)
    assert(df.columns.sorted === Array("extra", "k", "v"))
    val rows = df.select("k", "v", "extra").orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(rows.toSeq === Seq((1, "a", None), (2, "b", Some(9.5))))
  }

  test("partitioned append prunes partitions at scan time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/t"
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("order_year", year(col("o_orderdate")))
    LakeWriter.appendPartitioned(o, dir, Seq("order_year"))
    val pruned = spark.read.parquet(dir).where(col("order_year") === 1995)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(order_year"),
      s"expected partition pruning:\n$plan")
    assert(pruned.count() ===
      o.where(col("order_year") === 1995).count())
  }
}
