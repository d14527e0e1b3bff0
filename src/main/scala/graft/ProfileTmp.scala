package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Optimization-round profiler: runs named queries once warm + once
  * timed with listeners printing per-job wall time and per-stage
  * duration/task counts — how the r15 single-task stages (one-file
  * scans, AQE-coalesced CPU-heavy joins) were found without the UI.
  */
object ProfileTmp {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(js.jobId, (js.time, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (t0, desc) =>
          System.err.println(f"[job] ${je.jobId}%4d ${(je.time - t0) / 1000.0}%7.3f s  $desc")
        }
      }
      override def onStageCompleted(
          sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val dt = (for { a <- i.completionTime; b <- i.submissionTime }
          yield (a - b) / 1000.0).getOrElse(-1.0)
        if (dt > 0.15)
          System.err.println(f"  [stage] ${i.stageId}%4d $dt%7.3f s  tasks=${i.numTasks}%3d  ${i.name.take(90)}")
      }
    })
    names.foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        // warm
        fn(spark, sfDir).count()
        System.err.println(s"==== $n timed run ====")
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        System.err.println(f"==== $n total ${(System.nanoTime() - t0) / 1e9}%.2f s ====")
      }
    }
    spark.stop()
  }
}
