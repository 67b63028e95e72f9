package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for the named gates to files — the plan
  * evidence the optimization rounds commit under `plans/rNN/`. Usage:
  * `runMain graft.PlanDump <outDir> <suffix> <gateCsv> [sfDir]`.
  * Each gate's DataFrame is CONSTRUCTED (layout gates run their write
  * workload doing so) and its final plan written to
  * `<outDir>/<gate>_<suffix>.txt`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <gateCsv> [sfDir]")
    val (outDir, suffix, gates) = (args(0), args(1),
      args(2).split(",").map(_.trim).filter(_.nonEmpty))
    val sfDir = args.lift(3).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.silenceBoundedWindowWarn()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (g <- gates) {
      val fn = SparkEntry.queries.getOrElse(g,
        throw new IllegalArgumentException(s"unknown gate $g"))
      val plan =
        try fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable =>
          s"PLAN FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}"
        }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${g}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plandump] wrote $outDir/${g}_$suffix.txt")
    }
    spark.stop()
  }
}
