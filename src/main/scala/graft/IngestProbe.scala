package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.layout.{DataLayout, Maintenance}

/** Steady-state probe of the WRITE path a 100 TB deployment actually runs:
  * txn-marked micro-batch appends (the streaming sink's commit discipline)
  * with the maintenance policy firing every K batches. Answers the two
  * questions the per-gate bench cannot:
  *
  *  1. ingestion THROUGHPUT (rows/s) as batch size grows — does per-commit
  *     fixed cost amortize, i.e. is the path batch-size-scalable?
  *  2. steady-state FILE COUNT under continuous ingest+maintenance — does
  *     small-file debt converge (bounded alive files) or accrete?
  *
  * Run: `sbt "runMain graft.IngestProbe [batches] [rowsPerBatch] [maintainEvery]"`
  * Prints one line per batch burst + a steady-state summary. Results are
  * recorded in PERFORMANCE.md; re-run with 10× rowsPerBatch for the scale
  * ratio.
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val batches = if (args.nonEmpty) args(0).toInt else 24
    val rowsPerBatch = if (args.length > 1) args(1).toLong else 100000L
    val maintainEvery = if (args.length > 2) args(2).toInt else 8
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = Files.createTempDirectory("graft_ingest").toString + "/t"
    val dims = Seq(col("user_id"), col("amount"))
    val stats = Seq("user_id", "amount", "event_id")
    val policy = Maintenance.Policy(rowsPerFile = math.max(rowsPerBatch, 1L << 18))

    var totalRows = 0L
    var ingestNanos = 0L
    var maintainNanos = 0L
    for (b <- 0 until batches) {
      // synthetic events: keys overlap across batches (realistic churn in
      // z-space, so batches interleave and compaction has real work)
      val batch = spark.range(rowsPerBatch)
        .select(
          (col("id") + b * rowsPerBatch).as("event_id"),
          pmod(col("id") * 2654435761L + b * 97L, lit(1L << 20)).as("user_id"),
          pmod(col("id") * 1103515245L, lit(1L << 16)).as("amount"))
      val t0 = System.nanoTime()
      DataLayout.appendZOrderedTxn(batch.toDF(), dims, 24, stats, dir,
        numFiles = 4, txnApp = "probe", txnBatch = b.toLong)
      val t1 = System.nanoTime()
      ingestNanos += t1 - t0
      totalRows += rowsPerBatch
      if (b % maintainEvery == maintainEvery - 1) {
        val m0 = System.nanoTime()
        val rep = Maintenance.run(spark, dir, dims, 24, stats, policy)
        maintainNanos += System.nanoTime() - m0
        val alive = rep.debtAfter.files
        println(f"batch $b%3d  ingest ${(t1 - t0) / 1e9}%6.2f s  " +
          f"maintain ${(System.nanoTime() - m0) / 1e9}%6.2f s  " +
          f"alive_files $alive%4d  (${rep.reasons.mkString("; ")})")
      }
    }
    val aliveFiles = DataLayout.aliveManifest(spark, dir).count()
    val readBack = DataLayout.readLayout(spark, dir).count()
    require(readBack == totalRows, s"rows lost: wrote $totalRows read $readBack")
    val ingestS = ingestNanos / 1e9
    val maintS = maintainNanos / 1e9
    println(f"TOTAL rows $totalRows  ingest $ingestS%.1f s " +
      f"(${totalRows / ingestS}%.0f rows/s)  maintenance $maintS%.1f s " +
      f"(${100 * maintS / (ingestS + maintS)}%.0f%% of wall)  " +
      f"steady-state alive files $aliveFiles")
    spark.stop()
  }
}
