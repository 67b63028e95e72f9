package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.layout.DataLayout

/** The object-store append profile (`directCommit` / `commitMode=direct`):
  * data bytes land once in a per-append subdir with NO top-level rename —
  * on S3-class stores a rename is a copy — and visibility is the manifest
  * commit alone. Read-back, time travel, pruning, exactly-once and vacuum
  * behavior must be identical to the rename path. */
class ObjectStoreCommitSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def mk(ids: Range) =
    ids.map(i => (i.toLong, (i * 13L) % 65536L)).toDF("id", "x")

  private val dims = Seq(col("x"))
  private def fs = org.apache.hadoop.fs.FileSystem.getLocal(
    spark.sparkContext.hadoopConfiguration)
  private def p(s: String) = new org.apache.hadoop.fs.Path(s)

  test("direct append: no root rename, identical read-back, pruning intact") {
    val dir = Files.createTempDirectory("graft_os").toString + "/t"
    DataLayout.writeZOrdered(mk(0 until 2000), dims, 16, Seq("id", "x"),
      dir, 4) // v0
    DataLayout.appendZOrdered(mk(2000 until 3000), dims, 16, Seq("id", "x"),
      dir, 2, directCommit = true) // v1, subdir-landed
    assert(DataLayout.currentVersion(spark, dir) == 1L)
    // the delta's files live under an exclusively-owned append-v1-* subdir
    val subdirs = fs.listStatus(p(dir)).filter(s =>
      s.isDirectory && s.getPath.getName.startsWith("append-v1-"))
    assert(subdirs.length == 1)
    val subFiles = fs.listStatus(subdirs.head.getPath)
      .filter(_.getPath.getName.endsWith(".parquet"))
    assert(subFiles.nonEmpty)
    // manifest-routed reads are whole and exact; time travel intact
    assert(DataLayout.readLayout(spark, dir).count() == 3000L)
    assert(DataLayout.readLayout(spark, dir, 0L).count() == 2000L)
    // the subdir files are stats-manifested: pruning covers them
    val scan = DataLayout.skipScan(spark, dir, Seq(("id", 2100L, 2200L)))
    assert(scan.filesRead < scan.filesTotal)
    assert(scan.df.count() == 101L)
    // the DOCUMENTED trade: a plain parquet read of the ROOT does not
    // descend into the subdir — direct-commit layouts read via manifest
    assert(spark.read.parquet(dir).count() == 2000L)
    // rewrites interoperate: a recluster absorbs the subdir files
    DataLayout.recluster(spark, dir, Seq(col("id")), 24, Seq("id"), 4)
    assert(DataLayout.readLayout(spark, dir).count() == 3000L)
  }

  test("direct txn append is exactly-once; a replay leaves no residue") {
    val dir = Files.createTempDirectory("graft_os").toString + "/t"
    DataLayout.writeZOrdered(mk(0 until 500), dims, 16, Seq("id", "x"),
      dir, 2)
    assert(DataLayout.appendZOrderedTxn(mk(500 until 600), dims, 16,
      Seq("id", "x"), dir, 1, "osq", 0L, directCommit = true))
    // fast-path replay: skipped before writing anything
    assert(!DataLayout.appendZOrderedTxn(mk(500 until 600), dims, 16,
      Seq("id", "x"), dir, 1, "osq", 0L, directCommit = true))
    assert(DataLayout.readLayout(spark, dir).count() == 600L)
    assert(fs.listStatus(p(dir)).count(s =>
      s.isDirectory && s.getPath.getName.startsWith("append-v")) == 1)
  }

  test("a crashed direct append (orphan subdir) is grace-aged residue vacuum reclaims") {
    val dir = Files.createTempDirectory("graft_os").toString + "/t"
    DataLayout.writeZOrdered(mk(0 until 500), dims, 16, Seq("id", "x"),
      dir, 2)
    // simulate a writer that died between its subdir write and its commit
    val orphan = s"$dir/append-v9-deadbeef"
    mk(9000 until 9100).coalesce(1).write.parquet(orphan)
    // readers never see it (manifest-routed)...
    assert(DataLayout.readLayout(spark, dir).count() == 500L)
    // ...a young orphan might be a LIVE append mid-commit: protected...
    DataLayout.vacuum(spark, dir)
    assert(fs.exists(p(orphan)))
    // ...an aged one is residue: files reclaimed, then the emptied dir
    val old = System.currentTimeMillis() - 2 * DataLayout.DefaultVacuumGraceMs
    fs.listStatus(p(orphan)).foreach(s => fs.setTimes(s.getPath, old, old))
    fs.setTimes(p(orphan), old, old)
    val rep = DataLayout.vacuum(spark, dir)
    assert(rep.filesDeleted >= 1)
    assert(!fs.exists(p(orphan)), "orphan subdir survived the aged vacuum")
    assert(DataLayout.readLayout(spark, dir).count() == 500L)
  }

  test("the SQL writer and streaming sink accept commitMode=direct") {
    val dir = Files.createTempDirectory("graft_os").toString + "/t"
    mk(0 until 400).write.format("graft").mode("overwrite")
      .option("dims", "x").option("statsCols", "id,x").save(dir)
    mk(400 until 500).write.format("graft").mode("append")
      .option("dims", "x").option("statsCols", "id,x")
      .option("commitMode", "direct").save(dir)
    assert(fs.listStatus(p(dir)).exists(s =>
      s.isDirectory && s.getPath.getName.startsWith("append-v1-")))
    assert(spark.read.format("graft").load(dir).count() == 500L)
    intercept[IllegalArgumentException] {
      mk(0 until 10).write.format("graft").mode("append")
        .option("dims", "x").option("commitMode", "s3magic").save(dir)
    }
  }
}
