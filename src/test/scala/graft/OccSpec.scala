package graft.layout

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Optimistic concurrency at the commit point: every mutation's log entry
  * is one part file renamed into place as `commit-v{N}.parquet`, so two
  * writers deriving the same version race to ONE winner — the loser
  * throws instead of silently interleaving manifest rows. Crashed stages
  * are invisible to readers and swept by vacuum. (Lives in package
  * graft.layout to exercise the `commitLogFile` primitive directly.)
  */
class OccSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTest.spark
  import spark.implicits._

  private val dims = Seq(col("k"))
  private def fresh(rows: Range): String = {
    val dir = Files.createTempDirectory("graft_occ").toString + "/t"
    DataLayout.writeZOrdered(rows.map(i => (i.toLong, i.toLong)).toDF("k", "amt"),
      dims, 16, Seq("k"), dir, 2)
    dir
  }
  private def fs = org.apache.hadoop.fs.FileSystem.getLocal(
    spark.sparkContext.hadoopConfiguration)
  private def p(s: String) = new org.apache.hadoop.fs.Path(s)

  test("commitLogFile: same version commits once; loser throws; stages vanish") {
    val log = Files.createTempDirectory("graft_occ").toString + "/log"
    DataLayout.commitLogFile(log, Seq(("a", 1L)).toDF("f", "x"), 7L)
    val e = intercept[java.util.ConcurrentModificationException] {
      DataLayout.commitLogFile(log, Seq(("b", 2L)).toDF("f", "x"), 7L)
    }
    assert(e.getMessage.contains("version 7"))
    // the winner's rows are untouched; exactly one commit file; no stages
    assert(spark.read.parquet(s"$log/commit-v7.parquet")
      .as[(String, Long)].collect().toSeq == Seq(("a", 1L)))
    val names = fs.listStatus(p(log)).map(_.getPath.getName)
    assert(names.count(_.startsWith("commit-v")) == 1)
    assert(!names.exists(_.startsWith("_stage_")))
    // a different version proceeds
    DataLayout.commitLogFile(log, Seq(("c", 3L)).toDF("f", "x"), 8L)
    assert(fs.exists(p(s"$log/commit-v8.parquet")))
  }

  test("manifest race end-to-end: the losing append aborts, reads stay intact") {
    val dir = fresh(1 to 100)
    // simulate a WEDGED race: a foreign commit occupies v1 but its rows
    // carry v_added = 0 (a duplicate of v0's — harmless: aliveManifest
    // collapses per file), so currentVersion reads 0 forever and every
    // retry re-derives v = 1. The appender must exhaust its bounded OCC
    // retries and abort loudly, never spin or silently corrupt.
    DataLayout.commitLogFile(s"$dir/${DataLayout.ManifestDir}",
      DataLayout.manifestLog(spark, dir), 1L)
    assert(DataLayout.currentVersion(spark, dir) == 0L)
    intercept[java.util.ConcurrentModificationException] {
      DataLayout.appendZOrdered(Seq((200L, 200L)).toDF("k", "amt"),
        dims, 16, Seq("k"), dir, 1)
    }
    // the loser's data files are unmanifested orphans: reads untouched
    assert(DataLayout.readLayout(spark, dir).count() == 100L)
    // a YOUNG unlogged orphan might be a live concurrent appender's
    // renamed-but-uncommitted output: vacuum protects it...
    assert(DataLayout.vacuum(spark, dir).filesDeleted == 0)
    // ...an AGED one is certainly residue: reclaimed. Age the wedged
    // foreign commit file too — log reclaim is equally grace-deferred (a
    // young commit may be a live writer's), and only the reclaim frees
    // version 1 for the retried append below.
    val logged = DataLayout.manifestLog(spark, dir).select("file")
      .collect().map(r => DataLayout.canon(r.getString(0))).toSet
    val old = System.currentTimeMillis() - 2 * DataLayout.DefaultVacuumGraceMs
    for (f <- DataLayout.listDataFiles(spark, dir)
         if !logged(DataLayout.canon(f)))
      fs.setTimes(p(f), old, old)
    fs.setTimes(p(s"$dir/${DataLayout.ManifestDir}/commit-v1.parquet"), old, old)
    val report = DataLayout.vacuum(spark, dir)
    assert(report.filesDeleted >= 1)
    assert(!fs.exists(p(s"$dir/${DataLayout.ManifestDir}/commit-v1.parquet")))
    DataLayout.appendZOrdered(Seq((200L, 200L)).toDF("k", "amt"),
      dims, 16, Seq("k"), dir, 1)
    assert(DataLayout.readLayout(spark, dir).count() == 101L)
  }

  test("DV race end-to-end: a visible foreign commit serializes the " +
      "delete after it; a true version collision aborts unmasked") {
    val dir = fresh(1 to 100)
    // a foreign DV commit for v1, ALREADY VISIBLE when the delete derives
    // its version (bogus file name: masks nothing). currentVersion reads
    // versions from commit FILE NAMES, so the deleter sees v1 and lands
    // at v2 — the delete serializes AFTER the observed commit instead of
    // losing to it (the pre-r19 content-derived probe read this planted
    // name/content mismatch as still-at-v0 and collided; writers never
    // produce that mismatch). The UNOBSERVED race — a commit landing
    // between derive and rename — is exercised with real threads in
    // "concurrent DV deletes" below; here the put-if-absent itself is
    // pinned directly.
    DataLayout.commitLogFile(s"$dir/${DataLayout.DvDir}",
      Seq(("bogus", 0L, 0L)).toDF("file", "pos", "v"), 1L)
    intercept[java.util.ConcurrentModificationException] {
      // the rename-level collision: a second commit claiming v1 loses
      DataLayout.commitLogFile(s"$dir/${DataLayout.DvDir}",
        Seq(("bogus2", 0L, 0L)).toDF("file", "pos", "v"), 1L)
    }
    // the losing commit left nothing behind: rows unmasked
    assert(DataLayout.readLayout(spark, dir).count() == 100L)
    val r = DataLayout.deleteVectors(spark, dir, Seq(("k", 1L, 10L)))
    assert(r.rowsDeleted == 10L)
    assert(DataLayout.currentVersion(spark, dir) == 2L) // after v1, not at it
    assert(DataLayout.readLayout(spark, dir).count() == 90L)
  }

  test("a crashed stage dir is invisible to readers and swept by vacuum") {
    val dir = fresh(1 to 50)
    // plant crash residue: a stage dir WITH a real parquet part inside
    val stage = p(s"$dir/${DataLayout.ManifestDir}/_stage_deadbeef")
    Seq(("bogus", 99L)).toDF("file", "v_added")
      .write.parquet(stage.toString)
    // readers: version and rows unaffected by the staged rows
    assert(DataLayout.currentVersion(spark, dir) == 0L)
    assert(DataLayout.readLayout(spark, dir).count() == 50L)
    // mutations continue past the residue
    DataLayout.appendZOrdered(Seq((60L, 60L)).toDF("k", "amt"),
      dims, 16, Seq("k"), dir, 1)
    assert(DataLayout.currentVersion(spark, dir) == 1L)
    // a YOUNG stage dir might be a live concurrent committer's in-flight
    // write (supported — vacuum's log compaction is snapshot-based and
    // never consolidates files it didn't list at start): protected...
    DataLayout.vacuum(spark, dir)
    assert(fs.exists(stage))
    // ...an AGED one is certainly crash residue: reclaimed
    val old = System.currentTimeMillis() - 2 * DataLayout.DefaultVacuumGraceMs
    fs.setTimes(stage, old, old)
    DataLayout.vacuum(spark, dir)
    assert(!fs.exists(stage))
  }

  test("sequential mutations never self-conflict: every version commits once") {
    val dir = fresh(1 to 60)
    DataLayout.appendZOrdered(Seq((100L, 1L)).toDF("k", "amt"), dims, 16, Seq("k"), dir, 1)
    DataLayout.deleteVectors(spark, dir, Seq(("k", 5L, 6L)))
    DataLayout.mergeInto(spark, dir, dims, 16, Seq("k"),
      Seq((7L, 700L)).toDF("k", "amt"), Seq("k"), 1)
    DataLayout.recluster(spark, dir, Seq(col("amt")), 16, Seq("k"), 2)
    assert(DataLayout.currentVersion(spark, dir) == 4L)
    val got = DataLayout.readLayout(spark, dir)
      .select("k", "amt").as[(Long, Long)].collect().toMap
    assert(got.size == 59 && got(7L) == 700L && !got.contains(5L))
    // one commit file per manifest version (v0 is the initial overwrite)
    val commits = fs.listStatus(p(s"$dir/${DataLayout.ManifestDir}"))
      .map(_.getPath.getName).filter(_.startsWith("commit-v")).sorted
    assert(commits.toSeq == Seq("commit-v1.parquet", "commit-v3.parquet",
      "commit-v4.parquet")) // v2 was the DV commit, in the DV log
  }

  test("OCC retry: a lost append race re-commits at the winner's next version") {
    val dir = fresh(1 to 100) // v0, 2 files
    val conf = spark.sparkContext.hadoopConfiguration
    val base = DataLayout.listDataFiles(spark, dir).head
    // plant a REALISTIC winner at v1: a new data file (a copy of an
    // existing one), manifested with proper v_added = 1 rows — exactly
    // what a concurrent appendZOrdered would have committed
    for (n <- Seq("winner.parquet", "loser.parquet"))
      org.apache.hadoop.fs.FileUtil.copy(fs, p(base), fs, p(s"$dir/$n"),
        false, conf)
    val template = DataLayout.manifestLog(spark, dir).limit(1)
      .localCheckpoint(true)
    def rowFor(f: String, v: Long) = template
      .withColumn("file", lit(s"$dir/$f"))
      .withColumn("v_added", lit(v))
      .withColumn("v_removed", lit(null).cast("long"))
    DataLayout.commitLogFile(s"$dir/${DataLayout.ManifestDir}",
      rowFor("winner.parquet", 1L), 1L)
    // the loser derived v = 1 BEFORE the winner landed; its data file is
    // already on disk — the retry must re-commit the same stats at v2,
    // never rewrite data, and both appends must be alive afterwards
    val got = DataLayout.commitAppendWithRetry(spark, dir,
      v => rowFor("loser.parquet", v), firstV = 1L)
    assert(got == 2L)
    assert(DataLayout.currentVersion(spark, dir) == 2L)
    val alive = DataLayout.aliveManifest(spark, dir)
      .select("file").as[String].collect().map(_.split('/').last).toSet
    assert(alive.contains("winner.parquet") && alive.contains("loser.parquet"))
    // time travel still stratifies: v1 sees the winner but not the loser
    val atV1 = DataLayout.aliveManifest(spark, dir, 1L)
      .select("file").as[String].collect().map(_.split('/').last).toSet
    assert(atV1.contains("winner.parquet") && !atV1.contains("loser.parquet"))
  }

  test("concurrent DV deletes: the loser re-runs and BOTH land") {
    val dir = fresh(1 to 400)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    // disjoint ranges racing on the version counter: whichever loses the
    // commit-file rename re-RUNS against the winner's state (re-running,
    // not re-committing, is what keeps exact row accounting when ranges
    // overlap — here they don't, so both must land in full)
    val fa = Future(DataLayout.deleteVectors(spark, dir, Seq(("k", 1L, 50L))))
    val fb = Future(DataLayout.deleteVectors(spark, dir, Seq(("k", 101L, 150L))))
    val ra = Await.result(fa, 3.minutes)
    val rb = Await.result(fb, 3.minutes)
    assert(ra.rowsDeleted == 50L && rb.rowsDeleted == 50L)
    assert(DataLayout.currentVersion(spark, dir) == 2L)
    assert(DataLayout.readLayout(spark, dir).count() == 300L)
  }

  test("zombie twins: concurrent same-(app,batch) txn appends land EXACTLY one") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = fresh(1 to 100) // v0
    // two writers believing they are THE query, same app + batch id,
    // different data — the restart-recovery race the markers exist for.
    // Whatever the interleaving (fast-path skip, or lost rename + abort
    // cleanup), exactly one commits and the other leaves NO trace.
    val gate = new java.util.concurrent.CountDownLatch(2)
    def twin(lo: Int): Future[Boolean] = Future {
      val data = (lo until lo + 100).map(i => (i.toLong, i.toLong))
        .toDF("k", "amt")
      gate.countDown(); gate.await()
      DataLayout.appendZOrderedTxn(data, dims, 16, Seq("k"), dir, 2,
        "twin_app", 5L)
    }
    val results = Await.result(
      Future.sequence(Seq(twin(1000), twin(2000))), 120.seconds)
    assert(results.count(identity) == 1, s"both/neither landed: $results")
    val ks = DataLayout.readLayout(spark, dir)
      .select("k").as[Long].collect().toSet
    val batch1 = (1000L until 1100L).toSet
    val batch2 = (2000L until 2100L).toSet
    assert((ks & batch1).isEmpty ^ (ks & batch2).isEmpty, s"mixed batches")
    assert(ks.size == 200) // base 100 + exactly one twin's 100
    // no unmanifested orphans: a plain parquet reader sees the same rows
    assert(spark.read.parquet(dir).count() == 200L)
    assert(DataLayout.currentVersion(spark, dir) == 1L)
    assert(DataLayout.lastCommittedTxn(spark, dir, "twin_app").contains(5L))
  }

  test("concurrent UNRELATED appends: the loser auto-retries and BOTH land") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = fresh(1 to 100) // v0
    val gate = new java.util.concurrent.CountDownLatch(2)
    def writer(lo: Int): Future[Unit] = Future {
      val data = (lo until lo + 100).map(i => (i.toLong, i.toLong))
        .toDF("k", "amt")
      gate.countDown(); gate.await()
      DataLayout.appendZOrdered(data, dims, 16, Seq("k"), dir, 2)
    }
    Await.result(Future.sequence(Seq(writer(1000), writer(2000))), 120.seconds)
    // both landed, at versions 1 and 2 in either order; rows exact; the
    // stage+rename attribution kept each commit's stats to its own files
    assert(DataLayout.currentVersion(spark, dir) == 2L)
    val ks = DataLayout.readLayout(spark, dir)
      .select("k").as[Long].collect().toSet
    assert(ks.size == 300 &&
      (1000L until 1100L).forall(ks) && (2000L until 2100L).forall(ks))
    assert(spark.read.parquet(dir).count() == 300L)
    // manifest attribution is exact: each version's added rows sum to 100
    val perV = DataLayout.manifestLog(spark, dir)
      .where(col("v_added") > 0 && !col("file").startsWith("_graft_"))
      .groupBy("v_added").agg(sum("n_rows").as("n"))
      .select("n").as[Long].collect().toSeq
    assert(perV == Seq(100L, 100L), s"attribution skewed: $perV")
  }

  test("vacuum racing appends: every commit that lands mid-vacuum survives") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = fresh(1 to 100) // v0
    // history for the vacuums to actually reclaim: a rewrite's tombstones
    DataLayout.recluster(spark, dir, dims, 16, Seq("k"), 2) // v1
    val appends = 8
    val gate = new java.util.concurrent.CountDownLatch(2)
    val appender = Future {
      gate.countDown(); gate.await()
      for (i <- 0 until appends)
        DataLayout.appendZOrdered(
          (1000 + i * 50 until 1050 + i * 50).map(j => (j.toLong, j.toLong))
            .toDF("k", "amt"), dims, 16, Seq("k"), dir, 1)
    }
    val vacuumer = Future {
      gate.countDown(); gate.await()
      // continuous vacuums across the whole append window: the snapshot
      // discipline means a commit file landing between a vacuum's log
      // listing and its old-file deletion is never compacted NOR deleted
      // (the old mode("overwrite") rewrite erased exactly such commits,
      // permanently orphaning the append's data)
      for (_ <- 0 until 12) DataLayout.vacuum(spark, dir, retainVersions = 1)
    }
    Await.result(Future.sequence(Seq(appender, vacuumer)), 300.seconds)
    assert(DataLayout.currentVersion(spark, dir) == (1 + appends).toLong)
    val ks = DataLayout.readLayout(spark, dir).select("k").as[Long].collect()
    assert(ks.length == 100 + appends * 50, s"rows lost: ${ks.length}")
    assert(ks.toSet.size == ks.length)
    // and the layout is still fully operable after the storm
    DataLayout.appendZOrdered(Seq((9999L, 1L)).toDF("k", "amt"),
      dims, 16, Seq("k"), dir, 1)
    assert(DataLayout.readLayout(spark, dir).count() == (101 + appends * 50).toLong)
  }

  test("concurrent schema evolution: the final schema covers BOTH writers' columns") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = fresh(1 to 100) // v0: {k, amt}
    val gate = new java.util.concurrent.CountDownLatch(2)
    // writer A extends by {b, c}; writer B by {b} only. If A wins the race,
    // B's retry finds A's schema already covers its delta and must record
    // NOTHING — recording its own pre-race merge at the higher version
    // would make column c vanish from latest reads.
    def writerA = Future {
      gate.countDown(); gate.await()
      DataLayout.appendZOrdered(
        Seq((500L, 1L, 2L, 3L)).toDF("k", "amt", "b", "c"),
        dims, 16, Seq("k"), dir, 1)
    }
    def writerB = Future {
      gate.countDown(); gate.await()
      DataLayout.appendZOrdered(
        Seq((600L, 1L, 2L)).toDF("k", "amt", "b"),
        dims, 16, Seq("k"), dir, 1)
    }
    Await.result(Future.sequence(Seq(writerA, writerB)), 120.seconds)
    val cols = DataLayout.readLayout(spark, dir).columns.toSet
    assert(Set("k", "amt", "b", "c").subsetOf(cols), s"schema regressed: $cols")
    // and the c values actually read back
    assert(DataLayout.readLayout(spark, dir)
      .where(col("k") === 500L).select("c").head().getLong(0) == 3L)
  }

  test("a data-semantic rewrite that loses the race still refuses (no auto-retry)") {
    val dir = fresh(1 to 100)
    // same wedged-race plant as the append test: v1 occupied, version 0
    DataLayout.commitLogFile(s"$dir/${DataLayout.ManifestDir}",
      DataLayout.manifestLog(spark, dir), 1L)
    intercept[java.util.ConcurrentModificationException] {
      DataLayout.deleteWhere(spark, dir, dims, 16, Seq("k"),
        Seq(("k", 1L, 10L)))
    }
    // nothing was deleted; the layout still reads at v0
    assert(DataLayout.readLayout(spark, dir).count() == 100L)
  }

  test("compaction racing an append: BOTH land (row-preserving rewrite re-validates)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = fresh(2 until 2002 by 2) // v0: even keys, 2 files
    // overlap debt so the compaction has real work: ODD keys interleave
    // the even base's z-range (clustering is on k)
    DataLayout.appendZOrdered(
      (1 until 1000 by 2).map(i => (i.toLong, i.toLong)).toDF("k", "amt"),
      dims, 16, Seq("k"), dir, 1) // v1: z-overlaps v0's first file
    val gate = new java.util.concurrent.CountDownLatch(2)
    val compactor = Future {
      gate.countDown(); gate.await()
      DataLayout.compactZOrdered(spark, dir, dims, 16, Seq("k"),
        rowsPerFile = 4000L)
    }
    val appender = Future {
      gate.countDown(); gate.await()
      DataLayout.appendZOrdered(
        (1 to 50).map(i => (i.toLong + 50000L, i.toLong + 50000L))
          .toDF("k", "amt"), dims, 16, Seq("k"), dir, 1)
    }
    val compacted = Await.result(
      compactor.zip(appender.map(_ => ())), 300.seconds)._1
    // the compaction really rewrote the overlap cluster...
    assert(compacted.filesRewritten >= 2, compacted.toString)
    // ...and both committed — whoever lost the version race re-validated
    // (the append's fresh file is never in the compaction's tombstone
    // set) — with every row present exactly once
    assert(DataLayout.currentVersion(spark, dir) == 3L)
    val ks = DataLayout.readLayout(spark, dir).select("k").as[Long].collect()
    assert(ks.length == 1550, s"rows lost or duplicated: ${ks.length}")
    assert(ks.toSet.size == 1550)
  }

  test("CONFLICTING rewrites racing: at most one lands work, the loser refuses, rows exact") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.util.{Failure, Try}
    val dir = fresh(1 to 1000) // v0
    DataLayout.appendZOrdered(
      (1 to 1000).map(i => (i.toLong + 10000L, i.toLong)).toDF("k", "amt"),
      dims, 16, Seq("k"), dir, 1) // v1: overlap debt both racers will claim
    val gate = new java.util.concurrent.CountDownLatch(2)
    def racer() = Future {
      gate.countDown(); gate.await()
      Try(DataLayout.compactZOrdered(spark, dir, dims, 16, Seq("k"),
        rowsPerFile = 4000L))
    }
    val results = Await.result(
      Future.sequence(Seq(racer(), racer())), 300.seconds)
    // the loser's re-validation finds its tombstone set already retired by
    // the winner: it must REFUSE (CME), never double-tombstone. (A racer
    // that read the manifest after the winner committed legitimately finds
    // nothing to compact — a no-op report, also safe.)
    results.collect { case Failure(e) =>
      assert(e.isInstanceOf[java.util.ConcurrentModificationException],
        s"unexpected failure: $e")
    }
    val worked = results.collect {
      case scala.util.Success(r) if r.filesRewritten > 0 => r
    }
    assert(worked.size <= 1, s"both rewrites landed work: $results")
    // and the data is exact regardless of which interleave happened
    val ks = DataLayout.readLayout(spark, dir).select("k").as[Long].collect()
    assert(ks.length == 2000 && ks.toSet.size == 2000, s"rows: ${ks.length}")
  }
}
