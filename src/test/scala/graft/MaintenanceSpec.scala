package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.layout.{DataLayout, Maintenance}

/** The nightly maintenance policy: debt assessment from metadata only,
  * threshold-gated step selection, and the bin-pack pass for adjacent
  * DISJOINT small files that overlap compaction cannot touch. */
class MaintenanceSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def mk(ids: Range) =
    ids.map(i => (i.toLong, i.toLong)).toDF("id", "x") // x == id: monotonic

  private val dims = Seq(col("x"))
  private val stats = Seq("id", "x")

  test("compactSmallFiles bin-packs adjacent disjoint small files; large files fence") {
    val dir = Files.createTempDirectory("graft_maint").toString + "/t"
    // monotonic ingest: each append's z-range sits strictly above the last
    // -> ZERO overlap, compactZOrdered has nothing to do, debt accretes
    DataLayout.writeZOrdered(mk(0 until 50), dims, 16, stats, dir, 1)   // small
    DataLayout.appendZOrdered(mk(50 until 100), dims, 16, stats, dir, 1)
    DataLayout.appendZOrdered(mk(100 until 150), dims, 16, stats, dir, 1)
    DataLayout.appendZOrdered(mk(150 until 1200), dims, 16, stats, dir, 1) // LARGE: fence
    DataLayout.appendZOrdered(mk(1200 until 1250), dims, 16, stats, dir, 1)
    DataLayout.appendZOrdered(mk(1250 until 1300), dims, 16, stats, dir, 1)
    val d0 = Maintenance.assess(spark, dir, rowsPerFile = 1000L)
    assert(d0.files == 6 && d0.smallFiles == 5 && d0.overlapFiles == 0)
    val largeFile = DataLayout.aliveManifest(spark, dir)
      .where(col("n_rows") >= 1000).select("file").head().getString(0)

    val r = DataLayout.compactSmallFiles(spark, dir, dims, 16, stats, 1000L)
    // the three below the fence pack into one bin, the two above another
    assert(r.clustersRewritten == 2 && r.filesRewritten == 5)
    assert(r.filesTotalAfter == 3)
    val after = DataLayout.aliveManifest(spark, dir)
      .select("file").as[String].collect()
    assert(after.contains(largeFile)) // the fence was never rewritten
    // data identical, still z-sorted and skip-scannable
    val all = DataLayout.readLayout(spark, dir)
    assert(all.count() == 1300L && all.select("id").distinct().count() == 1300L)
    val scan = DataLayout.skipScan(spark, dir, Seq(("x", 0L, 100L)))
    assert(scan.filesRead < scan.filesTotal)
    // old files tombstoned, not gone: the pre-compaction version reads back
    val vPrev = DataLayout.currentVersion(spark, dir) - 1
    assert(DataLayout.readLayout(spark, dir, vPrev).count() == 1300L)
  }

  test("Maintenance.run pays every debt class in one pass and reports it") {
    val dir = Files.createTempDirectory("graft_maint").toString + "/t"
    // overlap debt: base + interleaving delta (same x range)
    DataLayout.writeZOrdered(mk(0 until 2000), dims, 16, stats, dir, 4)
    DataLayout.appendZOrdered(mk(0 until 2000).withColumn("id", $"id" + 10000),
      dims, 16, stats, dir, 4)
    // DV debt
    DataLayout.deleteVectors(spark, dir, Seq(("x", 100L, 199L)))
    // small-file debt above the base's range
    for (b <- 0 until 4)
      DataLayout.appendZOrdered(mk(5000 + b * 50 until 5050 + b * 50),
        dims, 16, stats, dir, 1)
    val before = Maintenance.assess(spark, dir, 1000L)
    assert(before.dvRows == 200L && before.overlapFiles >= 2 &&
      before.smallFiles >= 4)

    val rep = Maintenance.run(spark, dir, dims, 16, stats,
      Maintenance.Policy(rowsPerFile = 1000L, minReclaimableFiles = 1,
        retainVersions = 1))
    assert(rep.purged.isDefined && rep.overlapCompacted.isDefined &&
      rep.binPacked.isDefined && rep.vacuumed.isDefined)
    assert(rep.reasons.size == 4)
    val after = rep.debtAfter
    // smallFiles need not hit zero: a packed bin below rowsPerFile is
    // still one small file — just no longer MERGEABLE debt. And
    // reclaimableFiles need not either: tombstones younger than the
    // retention horizon are DELIBERATELY kept for time travel
    assert(after.dvRows == 0L && after.overlapFiles == 0 &&
      after.smallFiles < before.smallFiles)
    assert(rep.vacuumed.get.filesDeleted > 0)
    assert(after.files < before.files)
    // the data: everything except the DV'd range, exactly once
    // (2000 base + 2000 delta + 200 small − 200 DV-deleted)
    val out = DataLayout.readLayout(spark, dir)
    assert(out.count() == 4000L)
    assert(out.where($"x".between(100, 199)).count() == 0L)
    // time travel inside the retention window survives the vacuum
    val v = DataLayout.currentVersion(spark, dir)
    assert(DataLayout.readLayout(spark, dir, v - 1).count() > 0L)
  }

  test("bloom indexes ride the pass: stale rows drop, fresh files cover, probes still prune") {
    val dir = Files.createTempDirectory("graft_maint").toString + "/t"
    // id is UNCORRELATED with the x clustering: bloom's home turf
    val df = (0 until 4000).map(i => (i.toLong, (i * 7919L) % 1000L))
      .toDF("id", "x")
    DataLayout.writeZOrdered(df, dims, 16, stats, dir, 4)
    DataLayout.buildBloomIndex(spark, dir, "id")
    // overlap debt (same x range) -> compaction will rewrite everything
    DataLayout.appendZOrdered(
      (4000 until 8000).map(i => (i.toLong, (i * 7919L) % 1000L)).toDF("id", "x"),
      dims, 16, stats, dir, 4)
    val rep = Maintenance.run(spark, dir, dims, 16, stats,
      Maintenance.Policy(rowsPerFile = 8000L, minReclaimableFiles = 1,
        retainVersions = 0))
    assert(rep.overlapCompacted.isDefined)
    val br = rep.bloomRefreshed
    assert(br.nonEmpty && br.head.column == "id")
    assert(br.head.staleDropped > 0L)  // the pre-compaction files' rows
    assert(br.head.filesIndexed > 0)   // the rewritten files now covered
    // the refreshed index still answers point lookups with NO unindexed
    // fallback reads (filesUnindexed == 0 would be ideal; assert it)
    val scan = DataLayout.bloomScan(spark, dir, "id", Seq(17L, 4321L))
    assert(scan.filesUnindexed == 0)
    assert(scan.df.select("id").as[Long].collect().sorted.toSeq == Seq(17L, 4321L))
  }

  test("vacuum reclaims crashed rewrite stages at the dir root and under the bloom index") {
    val dir = Files.createTempDirectory("graft_maint").toString + "/t"
    DataLayout.writeZOrdered(mk(0 until 500), dims, 16, stats, dir, 2)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate writers that died mid-rewrite LONG AGO: staged bytes,
    // never renamed, backdated past the vacuum grace (a YOUNG stage dir
    // is protected — it may be a live concurrent writer)
    val old = System.currentTimeMillis() - 2 * DataLayout.DefaultVacuumGraceMs
    for (p <- Seq(s"$dir/_graft_compact_stage/part-x.parquet",
        s"$dir/_graft_binpack_stage/part-y.parquet",
        s"$dir/_graft_bloom/_stage_k/part-z.parquet")) {
      val out = fs.create(new org.apache.hadoop.fs.Path(p))
      out.write(Array.fill(64)(7.toByte)); out.close()
      val parent = new org.apache.hadoop.fs.Path(p).getParent
      fs.setTimes(new org.apache.hadoop.fs.Path(p), old, old)
      fs.setTimes(parent, old, old)
    }
    assert(DataLayout.readLayout(spark, dir).count() == 500L) // invisible
    DataLayout.vacuum(spark, dir)
    for (d <- Seq("_graft_compact_stage", "_graft_binpack_stage",
        "_graft_bloom/_stage_k"))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$d")),
        s"$d survived vacuum")
    assert(DataLayout.readLayout(spark, dir).count() == 500L)
  }

  test("the vacuum trigger counts only what vacuum can reclaim under retention") {
    val dir = Files.createTempDirectory("graft_maint").toString + "/t"
    DataLayout.writeZOrdered(mk(0 until 2000), dims, 16, stats, dir, 4) // v0
    DataLayout.recluster(spark, dir, dims, 16, stats, 4)                // v1
    // v1's tombstones (v_removed = 1) sit INSIDE a retain-1 window at
    // hwm 1: a vacuum would reclaim nothing. The trigger must agree —
    // counting them anyway (the earlier shape) fired a no-yield,
    // whole-log-rewriting vacuum on EVERY maintenance pass under steady
    // churn.
    assert(Maintenance.assess(spark, dir, 1000L, retainVersions = 1)
      .reclaimableFiles == 0)
    // at retain 0 the same tombstones ARE reclaimable, and a run at that
    // policy vacuums them
    assert(Maintenance.assess(spark, dir, 1000L, retainVersions = 0)
      .reclaimableFiles == 4)
    val rep = Maintenance.run(spark, dir, dims, 16, stats,
      Maintenance.Policy(rowsPerFile = 1000L, minReclaimableFiles = 1,
        retainVersions = 0))
    assert(rep.vacuumed.exists(_.filesDeleted == 4))
    // and a second pass right after has nothing left to trigger on
    val rep2 = Maintenance.run(spark, dir, dims, 16, stats,
      Maintenance.Policy(rowsPerFile = 1000L, minReclaimableFiles = 1,
        retainVersions = 0))
    assert(rep2.vacuumed.isEmpty)
  }

  test("a clean layout is a no-op: nothing fires, no version burns") {
    val dir = Files.createTempDirectory("graft_maint").toString + "/t"
    DataLayout.writeZOrdered(mk(0 until 3000), dims, 16, stats, dir, 3)
    val v0 = DataLayout.currentVersion(spark, dir)
    val rep = Maintenance.run(spark, dir, dims, 16, stats,
      Maintenance.Policy(rowsPerFile = 1000L))
    assert(rep.purged.isEmpty && rep.overlapCompacted.isEmpty &&
      rep.binPacked.isEmpty && rep.vacuumed.isEmpty && rep.reasons.isEmpty)
    assert(DataLayout.currentVersion(spark, dir) == v0)
    assert(rep.debtBefore == rep.debtAfter)
  }
}
