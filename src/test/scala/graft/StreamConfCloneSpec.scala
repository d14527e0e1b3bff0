package graft

import org.apache.spark.sql.Row

/** Pins the Spark behavior `StreamTune.pinnedStart` depends on: a
  * streaming query clones the session conf SYNCHRONOUSLY inside
  * `start()`, so a conf set before `start()` and restored immediately
  * after is still the one the query runs with. If a Spark upgrade
  * defers the clone, this spec fails loudly instead of the tuning
  * silently reverting to session defaults.
  */
class StreamConfCloneSpec extends SparkTestBase {
  import spark.implicits._

  test("conf pinned around start() is the conf the stream runs with") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_clonespec").toString
    (1 to 100).map(i => (i.toLong, i % 7)).toDF("id", "k")
      .coalesce(1).write.parquet(root + "/in")
    val st = spark.readStream.schema("id LONG, k INT")
      .parquet(root + "/in")
    @volatile var innerParts = ""
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "3")
    val q = try {
      st.writeStream.foreachBatch {
        (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
          innerParts = b.sparkSession.conf.get(key)
          ()
      }.option("checkpointLocation", root + "/ck").start()
    } finally spark.conf.set(key, prev) // restore IMMEDIATELY
    q.processAllAvailable()
    q.stop()
    assert(innerParts === "3",
      "the stream saw the restored conf: the session clone is no " +
        "longer synchronous inside start() — StreamTune.pinnedStart " +
        "and the twin state sizing must restore after stop() instead")
    assert(spark.conf.get(key) === prev)
  }

  test("partitionsFor: feed-sized, floored at 1, capped at parallelism") {
    val f = graft.streaming.StreamTune.partitionsFor _
    assert(f(spark, 0L) === 1)
    assert(f(spark, 1L) === 1)
    assert(f(spark, (2.5 * (1 << 20)).toLong) === 3)
    assert(f(spark, Long.MaxValue / 4) ===
      spark.sparkContext.defaultParallelism)
  }
}
