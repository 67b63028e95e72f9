package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

import graft.layout.{DataLayout, GraftFileIndex}

/** The Catalyst-integrated manifest FileIndex: ANY query over
  * `readLayoutIndexed` must prune files through the min/max envelope and
  * the per-file Bloom index automatically — with results identical to an
  * unpruned read in every case (one-sided pruning: extra I/O possible,
  * wrong answers impossible). */
class FileIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  /** ids clustered by id into 8 ~1000-row files; `probe` is an EVEN value
    * UNCORRELATED with the clustering ((i*37 % 8000)*2 — a permutation of
    * the evens), so its per-file envelope spans everything, only a Bloom
    * filter can prune it, and every ODD value is inside every envelope
    * yet present nowhere; `txt` is NULL for ids 0..1999 (two files'
    * worth — range-boundary jitter still leaves at least one file
    * entirely NULL after clustering). */
  private def writeLayout(dir: String): Unit = {
    val df = (0 until 8000).map { i =>
      (i.toLong, (i.toLong * 37) % 8000 * 2, (i % 100).toLong,
        if (i < 2000) null else s"s$i")
    }.toDF("id", "probe", "bucket", "txt")
    DataLayout.writeZOrdered(df, Seq(col("id")), 16,
      Seq("id", "probe", "bucket", "txt"), dir, 8)
  }

  /** numFiles actually given to the scan, read from the executed plan. */
  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s.metrics("numFiles").value
    }
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
    scans.sum
  }

  test("range/point/IN predicates prune files inside Catalyst planning") {
    val dir = Files.createTempDirectory("graft_fidx").toString + "/t"
    writeLayout(dir)
    val (ldf, idx) = GraftFileIndex.readLayoutIndexed(spark, dir)
    // clustered-dim range: one file of eight
    val range = ldf.where(col("id") >= 2000 && col("id") < 2500)
    assert(range.count() == 500L)
    assert(idx.lastPruning.exists(_._1 <= 2), idx.lastPruning.toString)
    assert(scannedFiles(ldf.where(col("id") >= 2000 && col("id") < 2500)) <= 2)
    // disjunction of two far ranges: two files, both ends correct
    val disj = ldf.where(col("id") < 100 || col("id") >= 7900)
    assert(disj.count() == 200L)
    assert(idx.lastPruning.exists(_._1 <= 2), idx.lastPruning.toString)
    // IN on the clustered dim
    assert(ldf.where(col("id").isin(5L, 7777L)).count() == 2L)
    assert(idx.lastPruning.exists(_._1 <= 2), idx.lastPruning.toString)
    // pruning is invisible to results: full-table agg still exact
    assert(ldf.groupBy("bucket").count().count() == 100L)
  }

  test("bloom index prunes point lookups the envelope cannot") {
    val dir = Files.createTempDirectory("graft_fidx").toString + "/t"
    writeLayout(dir)
    DataLayout.buildBloomIndex(spark, dir, "probe")
    val (ldf, idx) = GraftFileIndex.readLayoutIndexed(spark, dir)
    // probe's envelope spans ~[0, 16000) in EVERY file — without the
    // bloom this reads 8/8. With it: the file(s) holding probe=7400.
    assert(ldf.where(col("probe") === 7400L).count() == 1L)
    val (kept, total) = idx.lastPruning.get
    assert(total == 8 && kept < 8, s"bloom pruned nothing: $kept/$total")
    // an ODD value sits inside every envelope but exists nowhere: the
    // bloom rejects (essentially) every file, the envelope none
    assert(ldf.where(col("probe") === 3701L).count() == 0L)
    assert(idx.lastPruning.exists(_._1 <= 1), idx.lastPruning.toString)
    // IN probes also consult the bitmaps
    assert(ldf.where(col("probe").isin(74L, 148L)).count() == 2L)
    assert(idx.lastPruning.exists(_._1 < 8), idx.lastPruning.toString)
  }

  test("IS NOT NULL drops the all-NULL file; unknown shapes scan everything") {
    val dir = Files.createTempDirectory("graft_fidx").toString + "/t"
    writeLayout(dir)
    val (ldf, idx) = GraftFileIndex.readLayoutIndexed(spark, dir)
    assert(ldf.where(col("txt").isNotNull).count() == 6000L)
    assert(idx.lastPruning.exists(_._1 <= 7),
      s"all-NULL file not dropped: ${idx.lastPruning}")
    // a shape the rewrite does not know — but Catalyst INFERS
    // IsNotNull(txt) from the null-intolerant length(), and that inferred
    // conjunct still drops the all-NULL files
    assert(ldf.where(length(col("txt")) === 5).count() ==
      (2000 until 8000).count(i => s"s$i".length == 5).toLong)
    assert(idx.lastPruning.exists(_._1 <= 7), idx.lastPruning.toString)
    // …and with the inference defeated (coalesce), nothing can prune:
    // full scan, exact result — the one-sided fallback
    assert(ldf.where(length(coalesce(col("txt"), lit(""))) === 5).count() ==
      (2000 until 8000).count(i => s"s$i".length == 5).toLong)
    assert(idx.lastPruning.exists(_._1 == 8), idx.lastPruning.toString)
    // string prefix prunes via the [p, ceiling(p)) interval on txt stats
    assert(ldf.where(col("txt").startsWith("s7")
      && col("txt").isNotNull).count() ==
      (2000 until 8000).count(i => s"s$i".startsWith("s7")).toLong)
  }

  test("snapshot isolation: the index pins its version across a mutation") {
    val dir = Files.createTempDirectory("graft_fidx").toString + "/t"
    writeLayout(dir)
    val (v0df, _) = GraftFileIndex.readLayoutIndexed(spark, dir)
    DataLayout.deleteWhere(spark, dir, Seq(col("id")), 16,
      Seq("id", "probe", "bucket", "txt"), Seq(("id", 0L, 3999L)))
    // the pre-mutation index still reads the pinned (v0) state
    assert(v0df.count() == 8000L)
    // a fresh index sees the delete
    val (v1df, _) = GraftFileIndex.readLayoutIndexed(spark, dir)
    assert(v1df.count() == 4000L)
    // explicit time travel through the index
    val (travel, _) = GraftFileIndex.readLayoutIndexed(spark, dir, version = 0L)
    assert(travel.count() == 8000L)
  }

  test("empty layout reads as zero rows, never a crash") {
    val dir = Files.createTempDirectory("graft_fidx").toString + "/t"
    writeLayout(dir)
    DataLayout.deleteWhere(spark, dir, Seq(col("id")), 16,
      Seq("id", "probe", "bucket", "txt"), Seq(("id", 0L, 999999L)))
    val (ldf, idx) = GraftFileIndex.readLayoutIndexed(spark, dir)
    assert(ldf.count() == 0L)
    assert(idx.lastPruning.exists(_._2 == 0), idx.lastPruning.toString)
  }
}
