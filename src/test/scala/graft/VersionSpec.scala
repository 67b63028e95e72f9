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
    val report = DataLayout.vacuum(spark, dir)
    assert(report.filesDeleted > 0)
    assert(report.logRowsAfter == aliveFiles)
    // latest version unchanged; raw dir now agrees with it
    assert(DataLayout.readLayout(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq == latestBefore)
    assert(spark.read.parquet(dir).count() == latestBefore.size.toLong)
    // idempotent
    assert(DataLayout.vacuum(spark, dir).filesDeleted == 0)
  }
}
