package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Right-to-be-forgotten, physically: row-level delete + compaction +
  * vacuum must leave NO byte of the erased record anywhere under the
  * table directory — not in a live file, not in an old snapshot, not in
  * a delete-layer or CDC sidecar file. Logical invisibility (the read
  * path) is necessary but NOT sufficient for erasure: old snapshot
  * files survive for time travel until vacuum, so the spec pins the
  * exact three-step recipe and byte-greps the directory afterward.
  */
class EraseSpec extends SparkTestBase {
  import spark.implicits._

  /** Does any file under `dir` (recursively) contain `needle`'s UTF-8
    * bytes? Parquet compresses, but a unique HIGH-ENTROPY string stays
    * literal in the data page (dictionary-encoded verbatim) — with
    * compression disabled below there is no transform to hide it.
    */
  private def bytesPresent(dir: String, needle: String): Boolean = {
    val n = needle.getBytes("UTF-8")
    def contains(hay: Array[Byte]): Boolean = {
      var i = 0
      while (i + n.length <= hay.length) {
        var j = 0
        while (j < n.length && hay(i + j) == n(j)) j += 1
        if (j == n.length) return true
        i += 1
      }
      false
    }
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(Files.isRegularFile(_))
      .exists(p => contains(Files.readAllBytes(p)))
  }

  test("delete + compact + vacuum physically erases the record's bytes") {
    // uncompressed pages so the byte-grep is airtight
    val prev = spark.conf.get("spark.sql.parquet.compression.codec", "snappy")
    spark.conf.set("spark.sql.parquet.compression.codec", "uncompressed")
    try {
      val t = Files.createTempDirectory("erase").toString + "/t"
      val secret = "SECRET-7f3a9c1e4b5d6072-FORGET-ME"
      val rows = Seq((1L, "alice", "keep-a"), (2L, "bob", secret),
        (3L, "carol", "keep-c")).toDF("id", "user", "payload")
      VersionedTable.append(spark, rows, t)
      assert(bytesPresent(t, secret), "fixture must start present")

      // step 1: logical delete — read path blind, bytes still on disk
      // (old snapshot + copy-on-write survivors)
      VersionedTable.delete(spark, t, expr("id = 2"))
      assert(VersionedTable.read(spark, t).where(col("id") === 2).count() === 0)
      assert(bytesPresent(t, secret),
        "a logical delete alone must NOT be mistaken for erasure")

      // step 2+3: rewrite survivors into fresh files, then drop every
      // pre-rewrite snapshot (retention 0 = the compliance override)
      VersionedTable.compact(spark, t, numFiles = 1)
      VersionedTable.vacuum(spark, t,
        keepFrom = VersionedTable.latest(spark, t)._1, retentionMs = 0L)
      assert(!bytesPresent(t, secret),
        "after compact + vacuum no byte of the record may remain")

      // the survivors are intact and the table still works
      assert(VersionedTable.read(spark, t).select("user")
        .as[String].collect().toSet === Set("alice", "carol"))
      VersionedTable.append(spark, Seq((4L, "dave", "new")).toDF(
        "id", "user", "payload"), t)
      assert(VersionedTable.read(spark, t).count() === 3)
    } finally {
      spark.conf.set("spark.sql.parquet.compression.codec", prev)
    }
  }

  test("vacuum reclaims crashed-writer _stage directories past retention") {
    val t = Files.createTempDirectory("orphan").toString + "/t"
    VersionedTable.append(spark, Seq((1L, "a")).toDF("id", "v"), t)
    // simulate a writer killed between its parquet write and the rename
    val stray = Paths.get(t, "_stage-deadbeef")
    Files.createDirectories(stray)
    Files.writeString(stray.resolve("part-0.parquet"), "orphan bytes")
    // within retention: untouched (could be a live stage)
    VersionedTable.vacuum(spark, t,
      keepFrom = 1L, retentionMs = 3600L * 1000)
    assert(Files.exists(stray), "a young stage dir must be respected")
    // past retention: reclaimed, table unharmed
    VersionedTable.vacuum(spark, t, keepFrom = 1L, retentionMs = 0L)
    assert(!Files.exists(stray), "an orphaned stage dir must be reclaimed")
    assert(VersionedTable.read(spark, t).count() === 1)
  }

  test("erasure works under merge-on-read deletes too (layer files vacuumed)") {
    val prev = spark.conf.get("spark.sql.parquet.compression.codec", "snappy")
    spark.conf.set("spark.sql.parquet.compression.codec", "uncompressed")
    try {
      val t = Files.createTempDirectory("erase_mor").toString + "/t"
      val secret = "SECRET-0d1c2b3a49586776-FORGET-ME"
      VersionedTable.append(spark,
        Seq((1L, "keep"), (2L, secret)).toDF("id", "payload"), t)
      // merge-on-read: the delete itself writes a KEY file — the erased
      // key must not leak through the layer either, so delete by id
      VersionedTable.deleteByKeys(spark, t, Seq(2L).toDF("id"))
      assert(VersionedTable.read(spark, t).count() === 1)
      assert(bytesPresent(t, secret), "MoR delete leaves the data file")
      VersionedTable.compact(spark, t, numFiles = 1)
      VersionedTable.vacuum(spark, t,
        keepFrom = VersionedTable.latest(spark, t)._1, retentionMs = 0L)
      assert(!bytesPresent(t, secret))
      assert(VersionedTable.read(spark, t).select("payload")
        .as[String].collect().toSeq === Seq("keep"))
    } finally {
      spark.conf.set("spark.sql.parquet.compression.codec", prev)
    }
  }
}
