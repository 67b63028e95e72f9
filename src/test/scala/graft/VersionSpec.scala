package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.layout.DataLayout

/** Versioned-manifest behavior: time travel, vacuum, and the
  * churn-proportional version diff. */
class VersionSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private val dims = Seq(col("x"), col("y"))

  private def mk(ids: Range) =
    ids.map(i => (i.toLong, (i * 13L) % 65536L, (i * 31L) % 65536L))
      .toDF("id", "x", "y")

  private def build(dir: String): Unit = {
    DataLayout.writeZOrdered(mk(0 until 3000), dims, 16, Seq("x", "y"),
      dir, numFiles = 6)                                              // v0
    DataLayout.appendZOrdered(mk(10000 until 10500), dims, 16, Seq("x", "y"),
      dir, numFiles = 2)                                              // v1
    DataLayout.deleteWhere(spark, dir, dims, 16, Seq("x", "y"),
      Seq(("x", 0L, 2000L)))                                          // v2
  }

  test("history: one row per version with exact add/remove/DV accounting") {
    val dir = Files.createTempDirectory("graft_version").toString + "/t"
    build(dir)                                                  // v0 v1 v2
    DataLayout.deleteVectors(spark, dir, Seq(("x", 3000L, 4000L)))  // v3
    val h = DataLayout.history(spark, dir)
      .select("version", "files_added", "rows_added", "files_removed",
        "rows_removed", "dv_rows_deleted")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toList
    assert(h.map(_._1) == List(0L, 1L, 2L, 3L))
    val byV = h.map(r => r._1 -> r).toMap
    assert(byV(0L)._2 == 6 && byV(0L)._3 == 3000 && byV(0L)._4 == 0) // initial
    assert(byV(1L)._2 == 2 && byV(1L)._3 == 500)                     // append
    assert(byV(2L)._4 > 0 && byV(2L)._5 > 0 && byV(2L)._6 == 0)     // rewrite
    assert(byV(3L)._2 == 0 && byV(3L)._6 > 0)                        // DV-only
    // rows removed at v2 - rows re-added at v2 = the deleted rows
    val deletedAtV2 = byV(2L)._5 - byV(2L)._3
    val want = mk(0 until 3000).unionByName(mk(10000 until 10500))
      .where(col("x") <= 2000L).count()
    assert(deletedAtV2 == want)
    // the post-OCC versions carry a commit timestamp; v0 reads NULL
    val ts = DataLayout.history(spark, dir)
      .select("version", "committed_at").collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(ts(0L) && !ts(1L) && !ts(2L) && !ts(3L))
  }

  test("every version reads back exactly as it stood") {
    val dir = Files.createTempDirectory("graft_version").toString + "/t"
    build(dir)
    assert(DataLayout.currentVersion(spark, dir) == 2L)
    def ids(v: Long) = DataLayout.readLayout(spark, dir, v)
      .select("id").as[Long].collect().sorted.toSeq
    val v0 = (0 until 3000).map(_.toLong)
    val v1 = v0 ++ (10000 until 10500).map(_.toLong)
    val v2 = v1.filterNot(i => (i * 13L) % 65536L <= 2000L)
    assert(ids(0L) == v0)
    assert(ids(1L) == v1)
    assert(ids(2L) == v2)
    assert(ids(DataLayout.Latest) == v2)
    // skipScan is version-aware too
    val s1 = DataLayout.skipScan(spark, dir, Seq(("x", 0L, 2000L)), version = 1L)
    assert(s1.df.count() == v1.count(i => (i * 13L) % 65536L <= 2000L).toLong)
    val s2 = DataLayout.skipScan(spark, dir, Seq(("x", 0L, 2000L)))
    assert(s2.df.count() == 0L)
  }

  test("diffVersions reads only churned files and emits the exact delta") {
    val dir = Files.createTempDirectory("graft_version").toString + "/t"
    build(dir)
    // v0 -> v1: pure append — every diff row is a '+' with an appended id
    val d01 = DataLayout.diffVersions(spark, dir, 0L, 1L, Seq("id"))
    assert(d01.filesUnchanged >= 6, s"$d01")
    val plus = d01.df.select("sign", "id").as[(String, Long)].collect().toSeq
    assert(plus.forall(_._1 == "+"))
    assert(plus.map(_._2).sorted == (10000L until 10500L))
    // v1 -> v2: pure delete — every diff row is a '-' with a deleted id
    val d12 = DataLayout.diffVersions(spark, dir, 1L, 2L, Seq("id"))
    val minus = d12.df.select("sign", "id").as[(String, Long)].collect().toSeq
    assert(minus.forall(_._1 == "-"))
    val wantGone = ((0 until 3000) ++ (10000 until 10500)).map(_.toLong)
      .filter(i => (i * 13L) % 65536L <= 2000L).sorted
    assert(minus.map(_._2).sorted == wantGone)
    // churn proportionality: the delete touched a subset of files; the
    // untouched ones were never read
    assert(d12.filesUnchanged > 0, s"$d12")
    // v0 -> v2 composes both
    val d02 = DataLayout.diffVersions(spark, dir, 0L, 2L, Seq("id"))
    val both = d02.df.select("sign", "id").as[(String, Long)].collect().toSeq
    val gone0 = (0 until 3000).map(_.toLong).filter(i => (i * 13L) % 65536L <= 2000L)
    val add0 = (10000 until 10500).map(_.toLong).filterNot(i => (i * 13L) % 65536L <= 2000L)
    assert(both.filter(_._1 == "-").map(_._2).sorted == gone0.sorted)
    assert(both.filter(_._1 == "+").map(_._2).sorted == add0.sorted)
  }

  test("vacuum removes retired files, keeps the latest version exact") {
    val dir = Files.createTempDirectory("graft_version").toString + "/t"
    build(dir)
    val latestBefore = DataLayout.readLayout(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq
    val aliveFiles = DataLayout.aliveManifest(spark, dir).count()
    val onDiskBefore = spark.read.parquet(dir).count() // retired rows visible raw
    assert(onDiskBefore > latestBefore.size.toLong,
      "precondition: retired files still on disk before vacuum")
    val report = DataLayout.vacuum(spark, dir, retainVersions = 0)
    assert(report.filesDeleted > 0)
    assert(report.logRowsAfter == aliveFiles)
    // latest version unchanged; raw dir now agrees with it
    assert(DataLayout.readLayout(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq == latestBefore)
    assert(spark.read.parquet(dir).count() == latestBefore.size.toLong)
    // idempotent
    assert(DataLayout.vacuum(spark, dir, retainVersions = 0).filesDeleted == 0)
    // the version high-water mark survives the vacuum: the next mutation
    // must NOT reuse an already-issued version id
    assert(DataLayout.currentVersion(spark, dir) == 2L)
    DataLayout.appendZOrdered(mk(20000 until 20100), dims, 16, Seq("x", "y"),
      dir, numFiles = 1)
    assert(DataLayout.currentVersion(spark, dir) == 3L)
    assert(DataLayout.readLayout(spark, dir, 3L).count() ==
      latestBefore.size.toLong + 100L)
  }

  test("vacuum retention: retained versions stay travelable, below the horizon refuses") {
    val dir = Files.createTempDirectory("graft_version").toString + "/t"
    build(dir) // v0 write, v1 append, v2 delete
    val v1Ids = DataLayout.readLayout(spark, dir, 1L)
      .select("id").as[Long].collect().sorted.toSeq
    val v2Ids = DataLayout.readLayout(spark, dir, 2L)
      .select("id").as[Long].collect().sorted.toSeq
    // default vacuum keeps ONE version of history: horizon = 1
    DataLayout.vacuum(spark, dir)
    assert(DataLayout.vacuumHorizon(spark, dir) == 1L)
    // v1 and v2 still read back exactly
    assert(DataLayout.readLayout(spark, dir, 1L)
      .select("id").as[Long].collect().sorted.toSeq == v1Ids)
    assert(DataLayout.readLayout(spark, dir, 2L)
      .select("id").as[Long].collect().sorted.toSeq == v2Ids)
    // v0 refuses loudly — even though some of its files may physically
    // remain, a versioned read below the horizon must never be partial
    val e = intercept[IllegalArgumentException] {
      DataLayout.readLayout(spark, dir, 0L)
    }
    assert(e.getMessage.contains("vacuum horizon"))
    // the horizon never regresses: a lenient vacuum later cannot
    // re-promise versions whose files are already gone
    DataLayout.vacuum(spark, dir, retainVersions = 100)
    assert(DataLayout.vacuumHorizon(spark, dir) == 1L)
    intercept[IllegalArgumentException] {
      DataLayout.readLayout(spark, dir, 0L)
    }
    // GDPR spelling: retain 0 → only the latest version survives
    val rep = DataLayout.vacuum(spark, dir, retainVersions = 0)
    assert(rep.filesDeleted > 0)
    intercept[IllegalArgumentException] {
      DataLayout.readLayout(spark, dir, 1L)
    }
    assert(DataLayout.readLayout(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq == v2Ids)
    // raw dir agrees with the latest version: retired bytes are gone
    assert(spark.read.parquet(dir).count() == v2Ids.size.toLong)
    // and the table still moves forward
    DataLayout.appendZOrdered(mk(20000 until 20050), dims, 16, Seq("x", "y"),
      dir, numFiles = 1)
    assert(DataLayout.currentVersion(spark, dir) == 3L)
    assert(DataLayout.readLayout(spark, dir).count() == v2Ids.size + 50L)
  }

  test("full erasure: delete everything, vacuum, version preserved, loud empty read") {
    val dir = Files.createTempDirectory("graft_version").toString + "/t"
    DataLayout.writeZOrdered(mk(0 until 500), dims, 16, Seq("x", "y"),
      dir, numFiles = 2)                                              // v0
    val rep = DataLayout.deleteWhere(spark, dir, dims, 16, Seq("x", "y"),
      Seq(("x", 0L, 65535L)))                                         // v1
    assert(rep.rowsDeleted == 500L)
    assert(DataLayout.readLayout(spark, dir).count() == 0L) // schema from retired files
    DataLayout.vacuum(spark, dir, retainVersions = 0)
    // a pure-tombstone version must not vanish from the version counter
    assert(DataLayout.currentVersion(spark, dir) == 1L)
    // the SCHEMA LOG survives full erasure, so the table still knows its
    // own shape: an empty, correctly-typed read (Delta semantics)
    val empty = DataLayout.readLayout(spark, dir)
    assert(empty.count() == 0L && empty.columns.toSeq == Seq("id", "x", "y"))
    // the table can still move forward: the next append is version 2
    DataLayout.appendZOrdered(mk(0 until 10), dims, 16, Seq("x", "y"),
      dir, numFiles = 1)
    assert(DataLayout.currentVersion(spark, dir) == 2L)
    assert(DataLayout.readLayout(spark, dir).count() == 10L)
    // a PRE-schema-log layout (no log to fall back on) erased the same way
    // refuses loudly, not with a cryptic AnalysisException
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/${DataLayout.SchemaDir}"), true)
    DataLayout.deleteWhere(spark, dir, dims, 16, Seq("x", "y"),
      Seq(("x", 0L, 65535L)))
    DataLayout.vacuum(spark, dir, retainVersions = 0)
    val e = intercept[IllegalArgumentException] {
      DataLayout.readLayout(spark, dir)
    }
    assert(e.getMessage.contains("fully erased"))
  }

  test("changeFeed: per-step rows at churn cost; compaction steps are empty") {
    val dir = Files.createTempDirectory("graft_version").toString + "/t"
    build(dir) // v0 write, v1 append, v2 delete
    // a compaction step moves files but not rows — the feed must show it
    // as ZERO change rows (the file-set diff sees only identical content)
    DataLayout.compactZOrdered(spark, dir, dims, 16, Seq("x", "y"),
      rowsPerFile = 5000L)                                            // v3
    val feed = DataLayout.changeFeed(spark, dir, 0L,
      DataLayout.currentVersion(spark, dir), Seq("id"), Seq("x", "y"))
      .select("version", "sign", "id")
      .as[(Long, String, Long)].collect().toSeq
    val byVersion = feed.groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).sorted).toMap
    // v1: the 500 appended ids arrive, nothing leaves
    assert(byVersion(1L) == (10000 until 10500).map(i => ("+", i.toLong)))
    // v2: exactly the deleted ids leave (from BOTH the base and the
    // appended range — 10083..10236 wrap back under x = 2000), nothing
    // arrives
    val deleted = ((0 until 3000) ++ (10000 until 10500)).map(_.toLong)
      .filter(i => (i * 13L) % 65536L <= 2000L).sorted
    assert(byVersion(2L) == deleted.map(i => ("-", i)))
    // v3 (compaction): no semantic change → no feed rows at all
    assert(!byVersion.contains(3L), byVersion.getOrElse(3L, Nil).take(5).toString)
    // contract refusals
    intercept[IllegalArgumentException] {
      DataLayout.changeFeed(spark, dir, 2L, 2L, Seq("id"))
    }
    intercept[IllegalArgumentException] {
      DataLayout.changeFeed(spark, dir, 0L, 99L, Seq("id"))
    }
  }

  test("changeFeed ≡ per-step diffVersions across a mixed history") {
    val dir = Files.createTempDirectory("graft_version").toString + "/t"
    build(dir) // v0 write, v1 append, v2 delete
    DataLayout.deleteVectors(spark, dir, Seq(("x", 60000L, 61000L)))  // v3 DV
    DataLayout.compactZOrdered(spark, dir, dims, 16, Seq("x", "y"),
      rowsPerFile = 5000L)                                            // v4
    DataLayout.deleteWhere(spark, dir, dims, 16, Seq("x", "y"),
      Seq(("x", 30000L, 31000L)))                                     // v5
    DataLayout.appendZOrdered(mk(30000 until 30100), dims, 16,
      Seq("x", "y"), dir, 1)                                          // v6
    val cur = DataLayout.currentVersion(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select("version", "sign", "id", "x", "y")
        .collect().map(_.toString).sorted.toSeq
    val feed = rows(DataLayout.changeFeed(spark, dir, 0L, cur,
      Seq("id"), Seq("x", "y")))
    val manual = (0L until cur).flatMap(v =>
      rows(DataLayout.diffVersions(spark, dir, v, v + 1, Seq("id"),
        Seq("x", "y")).df.withColumn("version", lit(v + 1)))).sorted
    assert(feed == manual)
  }

  test("changeFeed batches a long append-only catch-up into ONE scan plan") {
    val dir = Files.createTempDirectory("graft_version").toString + "/t"
    DataLayout.writeZOrdered(mk(0 until 200), dims, 16, Seq("x", "y"),
      dir, 1)                                                         // v0
    for (b <- 1 to 40)
      DataLayout.appendZOrdered(mk(b * 200 until (b + 1) * 200), dims, 16,
        Seq("x", "y"), dir, 1)                                        // v1..v40
    val feed = DataLayout.changeFeed(spark, dir, 0L, 40L, Seq("id"))
    // the whole 40-version backlog is one plan — no 40-way union
    assert(feed.queryExecution.optimizedPlan.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }.isEmpty, "append-only catch-up was not batched")
    val got = feed.select("version", "sign", "id")
      .as[(Long, String, Long)].collect()
    assert(got.length == 40 * 200)
    assert(got.forall(_._2 == "+"))
    // per-row version attribution is exact: id i arrived at version i/200
    assert(got.forall { case (v, _, id) => v == id / 200 })
  }

  test("changeFeed batches a DV-heavy history: one coordinate join, not one JoinDiff per night") {
    val dir = Files.createTempDirectory("graft_version").toString + "/t"
    DataLayout.writeZOrdered(mk(0 until 10000), dims, 16, Seq("id", "x", "y"),
      dir, 4)                                                         // v0
    // 12 nightly soft-delete steps, each masking a disjoint id stripe
    for (n <- 0 until 12)
      DataLayout.deleteVectors(spark, dir,
        Seq(("id", n * 100L, n * 100L + 49L)))                        // v1..v12
    val cur = DataLayout.currentVersion(spark, dir)
    assert(cur == 12L)
    val feed = DataLayout.changeFeed(spark, dir, 0L, cur, Seq("id"),
      Seq("x", "y"))
    // the whole run plans ONE masked-coordinate join — not 12 full-outer
    // JoinDiffs (and no union stitching them)
    val plan = feed.queryExecution.optimizedPlan
    assert(plan.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }.isEmpty, "DV-only run was not batched")
    assert(plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.size <= 1, "per-step JoinDiffs survived the batching")
    val got = feed.select("version", "sign", "id")
      .as[(Long, String, Long)].collect()
    assert(got.length == 12 * 50)
    assert(got.forall(_._2 == "-"))
    // per-row version attribution comes from the DV log itself
    assert(got.forall { case (v, _, id) => v == id / 100 + 1 })
    // and the batched spelling stays row-identical to per-step diffVersions
    val manual = (0L until cur).flatMap(v =>
      DataLayout.diffVersions(spark, dir, v, v + 1, Seq("id"),
          Seq("x", "y")).df.withColumn("version", lit(v + 1))
        .select("version", "sign", "id").as[(Long, String, Long)].collect())
    assert(got.sorted.toSeq == manual.sorted.toSeq)
  }

  test("diffVersions across a pure compaction reads NOTHING (fingerprints cancel)") {
    val dir = Files.createTempDirectory("graft_version").toString + "/t"
    DataLayout.writeZOrdered(mk(0 until 2000), dims, 16, Seq("x", "y"),
      dir, 1)                                                          // v0
    DataLayout.appendZOrdered(mk(2000 until 2200), dims, 16, Seq("x", "y"),
      dir, 1)                                                          // v1
    DataLayout.compactZOrdered(spark, dir, dims, 16, Seq("x", "y"),
      rowsPerFile = 1L << 20)                                          // v2
    val d = DataLayout.diffVersions(spark, dir, 1L, 2L, Seq("id"))
    assert(d.filesReadA == 0 && d.filesReadB == 0,
      s"row-preserving rewrite read rows: $d")
    assert(d.df.isEmpty)
  }

  test("changeFeed: fingerprint-proven row-preserving rewrites build NO plan") {
    val dir = Files.createTempDirectory("graft_version").toString + "/t"
    DataLayout.writeZOrdered(mk(0 until 2000), dims, 16, Seq("x", "y"),
      dir, 1)                                                          // v0
    // a maintenance-heavy history: appends interleaved with compactions
    // (row-preserving by construction) — only the appends carry changes
    for (b <- 1 to 6) {
      DataLayout.appendZOrdered(mk(b * 2000 until b * 2000 + 200), dims, 16,
        Seq("x", "y"), dir, 1)                         // odd versions: +200
      DataLayout.compactZOrdered(spark, dir, dims, 16, Seq("x", "y"),
        rowsPerFile = 1L << 20)                        // even: row-preserving
    }
    val cur = DataLayout.currentVersion(spark, dir)
    val feed = DataLayout.changeFeed(spark, dir, 0L, cur, Seq("id"),
      Seq("x", "y"))
    // the compactions are PROVEN empty from fingerprints and dropped
    // BEFORE run detection, so the six appends collapse into ONE run:
    // no union, no full-outer JoinDiff — just the run's scan plus its
    // broadcast version-attribution join
    val plan = feed.queryExecution.optimizedPlan
    assert(plan.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }.isEmpty, "maintenance versions broke the append run")
    assert(plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType != org.apache.spark.sql.catalyst.plans.Inner => j
    }.isEmpty, "a row-preserving rewrite still planned a JoinDiff")
    val got = feed.select("version", "sign", "id")
      .as[(Long, String, Long)].collect()
    assert(got.length == 6 * 200)
    assert(got.forall(_._2 == "+"))
    // attribution: each append batch keeps exactly ONE version, and the
    // versions are strictly increasing in batch order (a compaction that
    // found no z-overlap commits no version, so the exact numbers float —
    // what must hold is per-batch attribution, not a closed form)
    val byBatch = got.groupBy(_._3 / 2000).toSeq.sortBy(_._1)
      .map { case (b, rs) => b -> rs.map(_._1).distinct }
    assert(byBatch.forall(_._2.size == 1), s"split attribution: $byBatch")
    val vs = byBatch.map(_._2.head)
    assert(vs == vs.sorted && vs.distinct == vs, s"non-monotone: $vs")
  }

  test("recluster: content identical, pruning flips to the new dimension") {
    val dir = Files.createTempDirectory("graft_version").toString + "/t"
    DataLayout.writeZOrdered(mk(0 until 8000), dims, 16, Seq("x", "y"),
      dir, numFiles = 8)                                              // v0
    val before = DataLayout.readLayout(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq
    // an id-range scan on the (x, y) layout touches everything: id is
    // uncorrelated with the clustering — no stats even exist for it
    val rep = DataLayout.recluster(spark, dir, Seq(col("id")), 24,
      statsCols = Seq("id", "x"), numFiles = 8)                       // v1
    assert(rep.filesBefore == 8 && rep.filesAfter == 8)
    // content byte-for-byte identical...
    val after = DataLayout.readLayout(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq
    assert(after == before)
    // ...the change feed across the recluster is EMPTY (rows moved files,
    // no row changed)...
    assert(DataLayout.changeFeed(spark, dir, 0L, 1L, Seq("id"),
      Seq("x", "y")).isEmpty)
    // ...and an id range now prunes hard on the new clustering. The span
    // is 1000 rows over ~1000-row files, but repartitionByRange SAMPLES
    // its boundaries — uneven splits can make the range straddle a third
    // file, so ≤3 is the stable bound (the point is 8/8 → a handful)
    val scan = DataLayout.skipScan(spark, dir, Seq(("id", 2000L, 2999L)))
    assert(scan.filesRead <= 3, s"read ${scan.filesRead}/${scan.filesTotal}")
    assert(scan.df.select("id").as[Long].collect().sorted.toSeq ==
      (2000 until 3000).map(_.toLong))
    // the old version remains readable (history intact until vacuum)
    assert(DataLayout.readLayout(spark, dir, 0L).count() == 8000L)
  }

  test("compact tolerates files whose z-stats are NULL (all-NULL dims)") {
    val dir = Files.createTempDirectory("graft_version").toString + "/t"
    DataLayout.writeZOrdered(mk(0 until 600), dims, 16, Seq("x", "y"),
      dir, numFiles = 2)
    // a delta whose every dim is NULL -> one file with NULL zmin/zmax
    val nulls = Seq((100000L, Option.empty[Long], Option.empty[Long]),
      (100001L, Option.empty[Long], Option.empty[Long])).toDF("id", "x", "y")
    DataLayout.appendZOrdered(nulls, dims, 16, Seq("x", "y"), dir, numFiles = 1)
    // overlapping delta (same x/y range as the base, fresh ids) to force a
    // real compaction alongside the NULL file
    val delta = (0 until 200).map(i =>
      (300000L + i, (i * 13L) % 65536L, (i * 31L) % 65536L)).toDF("id", "x", "y")
    DataLayout.appendZOrdered(delta, dims, 16, Seq("x", "y"), dir, numFiles = 1)
    val report = DataLayout.compactZOrdered(spark, dir, dims, 16,
      Seq("x", "y"), rowsPerFile = 500L)
    assert(report.clustersRewritten >= 1)
    // every row — including the NULL-dim ones — survives
    assert(DataLayout.readLayout(spark, dir).count() == 802L)
  }
}
