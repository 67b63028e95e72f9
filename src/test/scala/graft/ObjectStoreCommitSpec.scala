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

  test("a DECLARED direct-mode layout: SQL DML inherits the profile, no root rename") {
    val dir = Files.createTempDirectory("graft_os").toString + "/t"
    mk(0 until 2000).write.format("graft").mode("overwrite")
      .option("dims", "id").option("statsCols", "id,x")
      .option("numFiles", "4").option("commitMode", "direct").save(dir)
    assert(graft.layout.LayoutConfig.mandatory(spark, dir).direct)
    def rootDataFiles: Set[String] = fs.listStatus(p(dir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName).toSet
    val v0Files = rootDataFiles // overwrite owns the root by definition
    def subdirsBy(prefix: String) = fs.listStatus(p(dir)).filter(s =>
      s.isDirectory && s.getPath.getName.startsWith(prefix))
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW osd USING graft OPTIONS (path '$dir')")
    // INSERT (native InsertableRelation) inherits direct from the config
    mk(2000 until 2100).createOrReplaceTempView("osd_ins")
    spark.sql("INSERT INTO osd SELECT * FROM osd_ins")
    assert(subdirsBy("append-v").length == 1)
    // DELETE (no DVs outstanding) = one atomic rewrite version (r20);
    // the hit-file rewrite lands in rewrite-delete_v* subdirs
    val del = graft.layout.GraftSql(spark,
      "DELETE FROM osd WHERE id BETWEEN 100 AND 199")
    assert(del.select("rows_deleted").head().getLong(0) == 100L)
    assert(subdirsBy("rewrite-delete_v").nonEmpty)
    // MERGE: the envelope-targeted rewrite lands in a rewrite-merge_v* subdir
    mk(0 until 50).withColumn("x", lit(-5L)).createOrReplaceTempView("osd_upd")
    val m = graft.layout.GraftSql(spark,
      """MERGE INTO osd USING osd_upd s ON osd.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(m.select("rows_updated").head().getLong(0) == 50L)
    assert(subdirsBy("rewrite-merge_v").nonEmpty)
    // UPDATE: the hit-file rewrite too
    graft.layout.GraftSql(spark, "UPDATE osd SET x = 9 WHERE id BETWEEN 300 AND 310")
    assert(subdirsBy("rewrite-update_v").nonEmpty)
    // across all four mutations: not ONE new data file at the root — the
    // object-store profile's whole point (each root rename is a copy)
    assert(rootDataFiles == v0Files,
      s"root gained files: ${(rootDataFiles -- v0Files).mkString(",")}")
    // and the layout stays exact through it all
    val back = DataLayout.readLayout(spark, dir)
    assert(back.count() == 2000L) // +100 ins, -100 del; merge/update in place
    assert(back.where(col("x") === -5L).count() == 50L)
    assert(back.where(col("x") === 9L).count() == 11L)
    // maintenance on the declared-direct layout also never root-renames
    DataLayout.deleteVectors(spark, dir, Seq(("id", 400L, 420L)))
    val rep = graft.layout.Maintenance.run(spark, dir, Seq(col("id")), 24,
      Seq("id", "x"), graft.layout.Maintenance.Policy(rowsPerFile = 500,
        minReclaimableFiles = 1, retainVersions = 0))
    assert(rep.purged.isDefined)
    assert(rootDataFiles.subsetOf(v0Files),
      "maintenance renamed rewrite output into the root on a direct layout")
  }
}
