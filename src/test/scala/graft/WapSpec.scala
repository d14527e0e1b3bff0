package graft

import org.apache.spark.sql.functions._

import graft.sources.{VersionedTable, Wap}

/** Write-audit-publish staging sessions (lk5 family). */
class WapSpec extends SparkTestBase {
  import spark.implicits._

  private def freshTable(name: String): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_wap_$name").toString + "/t"
    VersionedTable.append(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    dir
  }

  test("staged writes are invisible until publish; publish is one " +
    "atomic version") {
    val t = freshTable("iso")
    val h0 = Wap.begin(spark, t, "rel-1")
    val h1 = Wap.write(spark, h0, Seq((3L, "c")).toDF("id", "v"))
    val h2 = Wap.write(spark, h1, Seq((4L, "d")).toDF("id", "v"))
    // isolation: two staged writes, readers still see the base
    assert(VersionedTable.read(spark, t).count() === 2)
    assert(VersionedTable.latest(spark, t)._1 === h0.baseVersion)
    // the auditor sees base + staged
    assert(Wap.auditView(spark, h2).count() === 4)
    assert(Wap.stagedRows(spark, h2).as[(Long, String)].collect()
      .toSet === Set((3L, "c"), (4L, "d")))
    val v = Wap.publish(spark, h2)
    assert(v === h0.baseVersion + 1) // both writes land as ONE version
    assert(VersionedTable.read(spark, t).count() === 4)
  }

  test("publish is exactly-once: a retried publish with the same id " +
    "is a no-op and the id is single-use") {
    val t = freshTable("once")
    val h = Wap.write(spark, Wap.begin(spark, t, "rel-2"),
      Seq((3L, "c")).toDF("id", "v"))
    val v1 = Wap.publish(spark, h)
    // crash-after-commit retry: same files, same id — no second commit
    val v2 = VersionedTable.latest(spark, t)._1
    assert(v1 === v2)
    intercept[IllegalArgumentException] {
      Wap.begin(spark, t, "rel-2") // published ids can never reopen
    }
    assert(VersionedTable.read(spark, t).count() === 3)
  }

  test("strict publish refuses a moved base and leaves the session " +
    "open; plain publish merges") {
    val t = freshTable("strict")
    val h = Wap.write(spark, Wap.begin(spark, t, "rel-3"),
      Seq((3L, "c")).toDF("id", "v"))
    VersionedTable.append(spark, Seq((9L, "z")).toDF("id", "v"), t)
    intercept[IllegalStateException] {
      Wap.publish(spark, h, requireBaseUnchanged = true)
    }
    // session survived: staged rows intact, still publishable
    val r = Wap.resume(spark, t, "rel-3")
    assert(r.files === h.files)
    assert(Wap.stagedRows(spark, r).count() === 1)
    Wap.publish(spark, r)
    assert(VersionedTable.read(spark, t).as[(Long, String)].collect()
      .toSet === Set((1L, "a"), (2L, "b"), (9L, "z"), (3L, "c")))
  }

  test("abort deletes the staged files immediately") {
    val t = freshTable("abort")
    val h = Wap.write(spark, Wap.begin(spark, t, "rel-4"),
      Seq((3L, "c")).toDF("id", "v"))
    val f = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(h.files.nonEmpty)
    assert(h.files.forall(n =>
      f.exists(new org.apache.hadoop.fs.Path(t, n))))
    Wap.abort(spark, h)
    assert(h.files.forall(n =>
      !f.exists(new org.apache.hadoop.fs.Path(t, n))))
    assert(VersionedTable.read(spark, t).count() === 2)
    intercept[IllegalArgumentException] {
      Wap.resume(spark, t, "rel-4") // marker gone
    }
  }

  test("resume recovers a crashed session from the marker") {
    val t = freshTable("resume")
    Wap.write(spark, Wap.begin(spark, t, "rel-5"),
      Seq((3L, "c")).toDF("id", "v"))
    // "crash": the handle is lost; a new process resumes by id
    val r = Wap.resume(spark, t, "rel-5")
    assert(r.baseVersion === 1L)
    assert(r.files.size === 1 || r.files.nonEmpty)
    val h2 = Wap.write(spark, r, Seq((4L, "d")).toDF("id", "v"))
    Wap.publish(spark, h2)
    assert(VersionedTable.read(spark, t).count() === 4)
  }

  test("staged writes go through the table's CHECK constraints") {
    val t = freshTable("check")
    VersionedTable.alterProperties(spark, t,
      Map("graft.constraint.pos" -> "id > 0"))
    val h = Wap.begin(spark, t, "rel-6")
    intercept[Exception] {
      Wap.write(spark, h, Seq((-5L, "bad")).toDF("id", "v"))
    }
    // nothing staged, nothing visible; session still open for a fix
    val r = Wap.resume(spark, t, "rel-6")
    assert(r.files.isEmpty)
    Wap.publish(spark, Wap.write(spark, r,
      Seq((5L, "ok")).toDF("id", "v")))
    assert(VersionedTable.read(spark, t).count() === 3)
  }

  test("crash between commit and marker delete: retried publish keeps " +
    "the committed data files intact") {
    val t = freshTable("crashwin")
    val h = Wap.write(spark, Wap.begin(spark, t, "rel-7"),
      Seq((3L, "c")).toDF("id", "v"))
    val f = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(t, "_wap-rel-7.marker")
    // capture what the crashed process's marker looked like
    val markerBytes = {
      val len = f.getFileStatus(marker).getLen.toInt
      val buf = new Array[Byte](len)
      val in = f.open(marker); try in.readFully(buf) finally in.close()
      buf
    }
    val v1 = Wap.publish(spark, h)
    // simulate the crash window: commit landed but the marker delete
    // never ran — restore the marker as the dead process left it
    val out = f.create(marker, true)
    try out.write(markerBytes) finally out.close()
    // new process retries: resume + publish with the SAME file names
    val r = Wap.resume(spark, t, "rel-7")
    val v2 = Wap.publish(spark, r)
    assert(v2 === v1) // idempotent: no second version
    // the regression: the duplicate branch used to DELETE the files the
    // first commit references — all rows must still be readable
    assert(VersionedTable.read(spark, t).as[(Long, String)].collect()
      .toSet === Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(r.files.forall(n =>
      f.exists(new org.apache.hadoop.fs.Path(t, n))))
  }

  test("abort in the publish crash window refuses, cleans the marker, " +
    "and keeps the committed data") {
    val t = freshTable("crashabort")
    val h = Wap.write(spark, Wap.begin(spark, t, "rel-9"),
      Seq((3L, "c")).toDF("id", "v"))
    val f = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(t, "_wap-rel-9.marker")
    val markerBytes = {
      val len = f.getFileStatus(marker).getLen.toInt
      val buf = new Array[Byte](len)
      val in = f.open(marker); try in.readFully(buf) finally in.close()
      buf
    }
    Wap.publish(spark, h)
    // crash window: commit landed, marker delete never ran
    val out = f.create(marker, true)
    try out.write(markerBytes) finally out.close()
    // an operator abandons the release: abort must NOT delete the
    // now-committed files — it refuses and completes the marker cleanup
    val r = Wap.resume(spark, t, "rel-9")
    intercept[IllegalStateException] { Wap.abort(spark, r) }
    assert(!f.exists(marker)) // interrupted publish's cleanup completed
    assert(VersionedTable.read(spark, t).as[(Long, String)].collect()
      .toSet === Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("abort on a stale handle after publish refuses instead of " +
    "deleting committed data") {
    val t = freshTable("staleabort")
    val h = Wap.write(spark, Wap.begin(spark, t, "rel-8"),
      Seq((3L, "c")).toDF("id", "v"))
    Wap.publish(spark, h)
    intercept[IllegalArgumentException] {
      Wap.abort(spark, h) // session closed — must not touch the table
    }
    assert(VersionedTable.read(spark, t).count() === 3)
  }

  test("concurrent sessions stage independently and publish in turn") {
    val t = freshTable("multi")
    val a = Wap.write(spark, Wap.begin(spark, t, "rel-a"),
      Seq((10L, "x")).toDF("id", "v"))
    val b = Wap.write(spark, Wap.begin(spark, t, "rel-b"),
      Seq((20L, "y")).toDF("id", "v"))
    assert(VersionedTable.read(spark, t).count() === 2)
    Wap.publish(spark, a)
    Wap.publish(spark, b) // default mode merges past rel-a's commit
    assert(VersionedTable.read(spark, t).as[(Long, String)].collect()
      .toSet === Set((1L, "a"), (2L, "b"), (10L, "x"), (20L, "y")))
  }
}
