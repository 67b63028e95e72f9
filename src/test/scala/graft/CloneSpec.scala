package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.layout.{DataLayout, GraftFileIndex}

/** Shallow clones: zero-copy branches that diverge by copy-on-write and
  * can never damage their source. */
class CloneSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def fs = org.apache.hadoop.fs.FileSystem.getLocal(
    spark.sparkContext.hadoopConfiguration)

  private def fileIds(dir: String): Map[String, Long] =
    fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s.getPath.getName -> s.getModificationTime).toMap

  private def writeSample(dir: String, n: Int = 4000, files: Int = 8): Unit = {
    val rnd = new scala.util.Random(1234)
    val df = (0 until n).map { i =>
      (i.toLong, rnd.nextLong(1 << 16), rnd.nextLong(1 << 16))
    }.toDF("id", "x", "y")
    DataLayout.writeZOrdered(df, Seq(col("x"), col("y")), bits = 16,
      statsCols = Seq("x", "y"), outDir = dir, numFiles = files)
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  test("clone copies no data bytes, reads identically, and diverges by copy-on-write") {
    val root = Files.createTempDirectory("graft_clone_spec").toString
    val src = s"$root/src"; val dst = s"$root/dst"
    writeSample(src)
    val srcBefore = fileIds(src)
    val full = spark.read.parquet(src).select("id", "x", "y")
      .as[(Long, Long, Long)].collect().toSeq

    val rep = DataLayout.cloneLayout(spark, src, dst)
    assert(rep.filesShared == 8L && rep.dvPositions == 0L)
    // the clone dir holds ONLY metadata — zero physical data files
    assert(fileIds(dst).isEmpty)
    assert(ids(DataLayout.readLayout(spark, dst)) == full.map(_._1).sorted)
    // skipScan works off the cloned manifest (stats came along)
    val scan = DataLayout.skipScan(spark, dst, Seq(("x", 0L, 8191L)))
    assert(scan.filesRead < scan.filesTotal)
    assert(ids(scan.df) ==
      full.collect { case (id, x, _) if x <= 8191L => id }.sorted)

    // diverge: targeted delete on the CLONE rewrites shared files locally
    val del = DataLayout.deleteWhere(spark, dst, Seq(col("x"), col("y")), 16,
      Seq("x", "y"), Seq(("x", 0L, 4095L), ("y", 0L, 4095L)))
    assert(del.rowsDeleted > 0)
    // clone sees the delete; SOURCE is byte-identical and reads unchanged
    val want = full.collect { case (id, x, y)
      if !(x <= 4095L && y <= 4095L) => id }.sorted
    assert(ids(DataLayout.readLayout(spark, dst)) == want)
    assert(fileIds(src) == srcBefore)
    assert(ids(DataLayout.readLayout(spark, src)) == full.map(_._1).sorted)
    // the rewrite landed under the CLONE dir (copy-on-write)
    assert(fileIds(dst).nonEmpty)

    // vacuum on the clone: retires shared entries from ITS log only —
    // the shared source bytes stay on disk and the source still reads
    DataLayout.vacuum(spark, dst)
    assert(fileIds(src) == srcBefore)
    assert(ids(DataLayout.readLayout(spark, dst)) == want)
    assert(ids(DataLayout.readLayout(spark, src)) == full.map(_._1).sorted)
  }

  test("clone of an earlier version branches history; DV mask comes along") {
    val root = Files.createTempDirectory("graft_clone_spec").toString
    val src = s"$root/src"; val dst0 = s"$root/at0"; val dst1 = s"$root/at1"
    writeSample(src, n = 2000, files = 4)
    val full = spark.read.parquet(src).select("id", "x")
      .as[(Long, Long)].collect().toSeq
    DataLayout.deleteVectors(spark, src, Seq(("x", 0L, 30000L)))  // v1
    val masked = full.collect { case (id, x) if x > 30000L => id }.sorted

    val r0 = DataLayout.cloneLayout(spark, src, dst0, version = 0L)
    val r1 = DataLayout.cloneLayout(spark, src, dst1)
    assert(r0.dvPositions == 0L)
    assert(r1.dvPositions == full.count(_._2 <= 30000L).toLong)
    assert(ids(DataLayout.readLayout(spark, dst0)) == full.map(_._1).sorted)
    assert(ids(DataLayout.readLayout(spark, dst1)) == masked)
    // the Catalyst-indexed read works on a clone (schema inferred from a
    // manifest-referenced file — the clone owns no physical files)
    val (df, _) = GraftFileIndex.readLayoutIndexed(spark, dst1)
    assert(ids(df) == masked)
    // DV deletes keep working on the clone, against shared files, and
    // never write into the source's DV log
    val srcDvBefore = DataLayout.dvLog(spark, src).map(_.count()).getOrElse(0L)
    DataLayout.deleteVectors(spark, dst1, Seq(("x", 30001L, 40000L)))
    assert(ids(DataLayout.readLayout(spark, dst1)) ==
      full.collect { case (id, x) if x > 40000L => id }.sorted)
    assert(DataLayout.dvLog(spark, src).map(_.count()).getOrElse(0L) ==
      srcDvBefore)
    assert(ids(DataLayout.readLayout(spark, src)) == masked)
  }

  test("clone refusals: same dir, empty source") {
    val root = Files.createTempDirectory("graft_clone_spec").toString
    val src = s"$root/src"
    writeSample(src, n = 100, files = 1)
    intercept[IllegalArgumentException] {
      DataLayout.cloneLayout(spark, src, src)
    }
    intercept[IllegalArgumentException] {
      DataLayout.cloneLayout(spark, s"$root/nope", s"$root/dst")
    }
  }
}
