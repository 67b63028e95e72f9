package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.layout.{DataLayout, GraftFileIndex}

/** Deletion vectors: the soft-delete path that never rewrites a data file.
  * Mirrors Delta/Iceberg position deletes (reference engines rewrite or
  * re-diff instead — data_diff/table_segment.py has no mutation story at
  * all), built from plain Spark primitives: `_metadata.row_index`
  * coordinates + one left-anti join per masked read. */
class DeletionVectorSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def writeSample(dir: String, n: Int = 4000, files: Int = 8): Unit = {
    val rnd = new scala.util.Random(1234)
    val df = (0 until n).map { i =>
      (i.toLong, rnd.nextLong(1 << 16), rnd.nextLong(1 << 16))
    }.toDF("id", "x", "y")
    DataLayout.writeZOrdered(df, Seq(col("x"), col("y")), bits = 16,
      statsCols = Seq("x", "y"), outDir = dir, numFiles = files)
  }

  private def fs = org.apache.hadoop.fs.FileSystem.getLocal(
    spark.sparkContext.hadoopConfiguration)

  /** (name -> mtime) of every top-level data parquet in the layout. */
  private def fileIds(dir: String): Map[String, Long] =
    fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s.getPath.getName -> s.getModificationTime).toMap

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  test("deleteVectors: no data file changes; reads mask exactly; overlap never double-counts") {
    val dir = Files.createTempDirectory("graft_dv_spec").toString + "/t"
    writeSample(dir)
    val before = fileIds(dir)
    val full = spark.read.parquet(dir).select("id", "x", "y")
      .as[(Long, Long, Long)].collect().toSeq

    def inA(x: Long, y: Long) = x <= 20000L && y <= 20000L
    val r1 = DataLayout.deleteVectors(spark, dir,
      Seq(("x", 0L, 20000L), ("y", 0L, 20000L)))
    assert(r1.rowsDeleted == full.count { case (_, x, y) => inA(x, y) })
    assert(r1.rowsDeleted > 0)

    // overlapping second delete: only FRESH rows count
    def inB(x: Long) = x >= 10000L && x <= 30000L
    val r2 = DataLayout.deleteVectors(spark, dir, Seq(("x", 10000L, 30000L)))
    assert(r2.rowsDeleted ==
      full.count { case (_, x, y) => inB(x) && !inA(x, y) })

    // not a single data file was touched — name AND mtime identical
    assert(fileIds(dir) == before)

    // the masked read is exactly the conjunction of complements
    val want = full.collect { case (id, x, y)
      if !inA(x, y) && !inB(x) => id }.sorted
    assert(ids(DataLayout.readLayout(spark, dir)) == want)

    // skipScan composes the range predicate with the mask
    val scan = DataLayout.skipScan(spark, dir, Seq(("x", 0L, 40000L)))
    val scanWant = full.collect { case (id, x, y)
      if x <= 40000L && !inA(x, y) && !inB(x) => id }.sorted
    assert(ids(scan.df) == scanWant)

    // a delete matching nothing commits NO version
    val vBefore = DataLayout.currentVersion(spark, dir)
    val r3 = DataLayout.deleteVectors(spark, dir,
      Seq(("x", 70000L, 80000L)))
    assert(r3 == DataLayout.DvDeleteReport(0, 0L))
    assert(DataLayout.currentVersion(spark, dir) == vBefore)
  }

  test("deleteVectors time travel: each version reads under its own mask") {
    val dir = Files.createTempDirectory("graft_dv_spec").toString + "/t"
    writeSample(dir, n = 2000, files = 4)
    val full = spark.read.parquet(dir).select("id", "x", "y")
      .as[(Long, Long, Long)].collect().toSeq
    DataLayout.deleteVectors(spark, dir, Seq(("x", 0L, 30000L)))   // v1
    DataLayout.deleteVectors(spark, dir, Seq(("y", 0L, 30000L)))   // v2
    assert(DataLayout.currentVersion(spark, dir) == 2L)
    assert(ids(DataLayout.readLayout(spark, dir, 0L)) == full.map(_._1).sorted)
    assert(ids(DataLayout.readLayout(spark, dir, 1L)) ==
      full.collect { case (id, x, _) if x > 30000L => id }.sorted)
    assert(ids(DataLayout.readLayout(spark, dir)) ==
      full.collect { case (id, x, y) if x > 30000L && y > 30000L => id }.sorted)
    // manifest-derived n_rows stays EXACT per version under DVs
    def nRows(v: Long) = DataLayout.tableStatsFromManifest(
      spark, dir, version = v).select("n_rows").head().getLong(0)
    assert(nRows(0L) == full.size.toLong)
    assert(nRows(1L) == full.count(_._2 > 30000L).toLong)
    assert(nRows(DataLayout.Latest) ==
      full.count(t => t._2 > 30000L && t._3 > 30000L).toLong)
  }

  test("purgeDeletes rewrites only DV'd files; vacuum then drops the soft-deleted bytes") {
    val dir = Files.createTempDirectory("graft_dv_spec").toString + "/t"
    writeSample(dir)
    val full = spark.read.parquet(dir).select("id", "x")
      .as[(Long, Long)].collect().toSeq
    // corner delete: only a few of the 8 z-ordered files carry positions
    DataLayout.deleteVectors(spark, dir, Seq(("x", 0L, 4095L)))
    val before = fileIds(dir)
    val maskedWant = full.collect { case (id, x) if x > 4095L => id }.sorted

    val p = DataLayout.purgeDeletes(spark, dir,
      Seq(col("x"), col("y")), 16, Seq("x", "y"))
    assert(p.filesRewritten > 0 && p.filesRewritten <= 3, s"$p")
    assert(p.positionsApplied == full.count(_._2 <= 4095L).toLong)
    // untouched files keep their identity; rows unchanged by the purge
    val after = fileIds(dir)
    val untouched = before.filter { case (n, _) => after.get(n).contains(before(n)) }
    assert(untouched.size >= 8 - p.filesRewritten)
    assert(ids(DataLayout.readLayout(spark, dir)) == maskedWant)

    // vacuum: retired originals leave disk; a PLAIN read now equals the
    // masked read (the soft-deleted bytes are gone), and the DV log is
    // LOGICALLY empty — every DV'd file is dead post-purge, so no position
    // is effective at any retained version. (The physical DV commit files
    // linger up to the grace window — log reclaim is age-deferred so a
    // reader's in-flight listing never loses a file mid-read.)
    val vr = DataLayout.vacuum(spark, dir, retainVersions = 0)
    assert(vr.filesDeleted == p.filesRewritten)
    assert(ids(spark.read.parquet(dir).select("id")) == maskedWant)
    assert(!DataLayout.dvEffectiveAt(spark, dir))
    assert(ids(DataLayout.readLayout(spark, dir)) == maskedWant)
    // an aged DV log IS reclaimed: back-date it and vacuum again
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dvDir = new org.apache.hadoop.fs.Path(s"$dir/${DataLayout.DvDir}")
    val old = System.currentTimeMillis() - 2 * DataLayout.DefaultVacuumGraceMs
    fs.listStatus(dvDir).foreach(s => fs.setTimes(s.getPath, old, old))
    DataLayout.vacuum(spark, dir, retainVersions = 0)
    assert(DataLayout.dvLog(spark, dir).forall(_.isEmpty))
  }

  test("vacuum keeps DV rows that still mask alive files") {
    val dir = Files.createTempDirectory("graft_dv_spec").toString + "/t"
    writeSample(dir)
    val full = spark.read.parquet(dir).select("id", "x", "y")
      .as[(Long, Long, Long)].collect().toSeq
    DataLayout.deleteVectors(spark, dir, Seq(("x", 0L, 8000L)))        // v1: DV
    DataLayout.deleteWhere(spark, dir, Seq(col("x"), col("y")), 16,    // v2:
      Seq("x", "y"), Seq(("x", 60000L, 65535L), ("y", 60000L, 65535L))) // rewrite
    DataLayout.vacuum(spark, dir)
    // DV rows on files the rewrite did NOT touch must still mask reads
    val want = full.collect { case (id, x, y)
      if x > 8000L && !(x >= 60000L && y >= 60000L) => id }.sorted
    assert(ids(DataLayout.readLayout(spark, dir)) == want)
    assert(DataLayout.dvLog(spark, dir).exists(!_.isEmpty))
  }

  test("diffVersions and changeFeed see through a DV step at churn cost") {
    val dir = Files.createTempDirectory("graft_dv_spec").toString + "/t"
    writeSample(dir)
    val full = spark.read.parquet(dir).select("id", "x", "y")
      .as[(Long, Long, Long)].collect().toSeq
    DataLayout.deleteVectors(spark, dir,
      Seq(("x", 0L, 4095L), ("y", 0L, 4095L)))                         // v1
    val d = DataLayout.diffVersions(spark, dir, 0L, 1L, Seq("id"), Seq("x", "y"))
    val want = full.collect { case (id, x, y)
      if x <= 4095L && y <= 4095L => id }.sorted
    val got = d.df.select("sign", "id").as[(String, Long)].collect().toSeq
    assert(got.forall(_._1 == "-"))
    assert(got.map(_._2).sorted == want)
    // churn cost: only the DV'd files were pulled onto the two sides
    assert(d.filesReadA == d.filesReadB && d.filesReadA <= 3, s"$d")
    assert(d.filesUnchanged == 8 - d.filesReadA)
    // the derived CDC feed carries the same rows, stamped with version 1
    val feed = DataLayout.changeFeed(spark, dir, 0L, 1L, Seq("id"), Seq("x", "y"))
    assert(feed.select("id").as[Long].collect().sorted.toSeq == want)
    assert(feed.select("version").distinct().as[Long].collect().toSeq == Seq(1L))
  }

  test("Catalyst-indexed read applies the mask without losing scan pushdown") {
    val dir = Files.createTempDirectory("graft_dv_spec").toString + "/t"
    writeSample(dir)
    val full = spark.read.parquet(dir).select("id", "x")
      .as[(Long, Long)].collect().toSeq
    DataLayout.deleteVectors(spark, dir, Seq(("x", 0L, 10000L)))
    val (df, _) = GraftFileIndex.readLayoutIndexed(spark, dir)
    val q = df.where(col("x") <= lit(30000L)).select("id")
    assert(ids(q) == full.collect {
      case (id, x) if x > 10000L && x <= 30000L => id }.sorted)
    // the data predicate reached the parquet scan on the anti join's left
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("GraftFileIndex") &&
      l.contains("LessThanOrEqual(x,30000)")),
      plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }

  test("mergeInto never resurrects a soft-deleted row as a matched survivor") {
    val dir = Files.createTempDirectory("graft_dv_spec").toString + "/t"
    // cluster BY the merge key: 4000 ids in 4 files => ~1000-id envelopes
    val base = (0 until 4000).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
    DataLayout.writeZOrdered(base, Seq(col("id")), 16, Seq("id"), dir, 4)
    DataLayout.deleteVectors(spark, dir, Seq(("id", 0L, 1500L)))
    // delta keyed on soft-deleted ids 100..149 AND alive ids 2000..2049:
    // the dead ones come back as the DELTA's rows (an insert, not a
    // "matched" dead survivor), the alive ones update in place, and
    // soft-deleted ids outside the delta stay gone
    val delta = ((100 until 150) ++ (2000 until 2050))
      .map(i => (i.toLong, s"UPD$i")).toDF("id", "payload")
    val rep = DataLayout.mergeInto(spark, dir, Seq(col("id")), 16,
      Seq("id"), delta, Seq("id"), numFiles = 1)
    assert(rep.rowsUpdated == 50 && rep.rowsInserted == 50, rep.toString)
    val got = DataLayout.readLayout(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(got.size == 4000 - 1501 + 50)
    assert(got(105L) == "UPD105" && got(2005L) == "UPD2005")
    assert(!got.contains(500L) && got(3000L) == "v3000")
  }
}
