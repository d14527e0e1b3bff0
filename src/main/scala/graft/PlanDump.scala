package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Optimization-round tooling: dump `.explain("formatted")` for named
  * queries to files, so plan-shape claims (Exchange count, join strategy,
  * PushedFilters) are checkable without running Spark.
  *
  *   runMain graft.PlanDump <sfDir> <outDir> [name1,name2,...]
  *
  * Writes `<outDir>/<name>.txt` per query. Queries whose closure runs a
  * full lifecycle (streams, versioned-table commits) still execute it;
  * the dumped plan is of the RETURNED DataFrame — for those the
  * interesting plans are interior and are captured separately where a
  * round's notes need them.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet)
      else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(outDir, s"$name.txt"), txt)
          System.err.println(s"[plan] $name ok")
        } catch { case e: Throwable =>
          System.err.println(s"[plan] $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
