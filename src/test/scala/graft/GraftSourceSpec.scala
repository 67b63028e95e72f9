package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.layout.DataLayout

/** The `USING graft` batch source: SQL DDL + reader access to a layout
  * with time travel, DV masking, and (on clean versions) the full
  * Catalyst FileIndex pruning path. */
class GraftSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private val dims = Seq(col("x"))

  private def mk(ids: Range) =
    ids.map(i => (i.toLong, (i * 13L) % 65536L)).toDF("id", "x")

  test("SQL view over a layout: latest, time travel, WHERE, and joins") {
    val dir = Files.createTempDirectory("graft_src").toString + "/t"
    DataLayout.writeZOrdered(mk(0 until 2000), dims, 16, Seq("id", "x"), dir, 4) // v0
    DataLayout.appendZOrdered(mk(5000 until 5100), dims, 16, Seq("id", "x"), dir, 1) // v1
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW lay USING graft " +
      s"OPTIONS (path '$dir')")
    assert(spark.sql("SELECT count(*) c FROM lay").head().getLong(0) == 2100L)
    assert(spark.sql("SELECT count(*) c FROM lay WHERE id >= 5000")
      .head().getLong(0) == 100L)
    // time travel via versionAsOf
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW lay0 USING graft " +
      s"OPTIONS (path '$dir', versionAsOf '0')")
    assert(spark.sql("SELECT count(*) c FROM lay0").head().getLong(0) == 2000L)
    // reader form
    val df = spark.read.format("graft").option("versionAsOf", 0).load(dir)
    assert(df.count() == 2000L)
  }

  test("a DV-carrying version reads MASKED through SQL; a purge restores the fast path") {
    val dir = Files.createTempDirectory("graft_src").toString + "/t"
    DataLayout.writeZOrdered(mk(0 until 2000), dims, 16, Seq("id", "x"), dir, 4)
    DataLayout.deleteVectors(spark, dir, Seq(("id", 0L, 99L))) // v1: soft delete
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW dvlay USING graft " +
      s"OPTIONS (path '$dir')")
    assert(spark.sql("SELECT count(*) c FROM dvlay").head().getLong(0) == 1900L)
    assert(spark.sql("SELECT min(id) m FROM dvlay").head().getLong(0) == 100L)
    // filters still correct through the masked path
    assert(spark.sql("SELECT count(*) c FROM dvlay WHERE id < 200")
      .head().getLong(0) == 100L)
    // time travel to v0 un-hides the rows
    assert(spark.read.format("graft").option("versionAsOf", 0).load(dir)
      .count() == 2000L)
    // purge + re-create: clean version takes the HadoopFsRelation path —
    // assert the PLAN, not just the counts (the DV log deliberately keeps
    // its rows after a purge for time travel; relation choice must key on
    // EFFECTIVE DVs, or the slow masked path sticks forever)
    DataLayout.purgeDeletes(spark, dir, dims, 16, Seq("id", "x"))
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW dvlay USING graft " +
      s"OPTIONS (path '$dir')")
    val post = spark.sql("SELECT * FROM dvlay WHERE id < 200")
    assert(post.queryExecution.executedPlan.toString.contains("FileScan"),
      "purge did not restore the vectorized HadoopFsRelation path")
    assert(spark.sql("SELECT count(*) c FROM dvlay").head().getLong(0) == 1900L)
  }

  test("contract errors are loud: missing path, below-horizon version, write without dims") {
    val dir = Files.createTempDirectory("graft_src").toString + "/t"
    DataLayout.writeZOrdered(mk(0 until 100), dims, 16, Seq("id"), dir, 1)  // v0
    DataLayout.appendZOrdered(mk(100 until 110), dims, 16, Seq("id"), dir, 1) // v1
    DataLayout.appendZOrdered(mk(110 until 120), dims, 16, Seq("id"), dir, 1) // v2
    DataLayout.vacuum(spark, dir, retainVersions = 0)
    intercept[IllegalArgumentException] {
      spark.read.format("graft").load() // no path
    }
    val e = intercept[Exception] {
      spark.read.format("graft").option("versionAsOf", 0).load(dir).count()
    }
    assert(e.getMessage.contains("vacuum horizon"))
    // writes are supported (GraftWriteSpec) but demand the 'dims' option
    val w = intercept[Exception] {
      mk(0 until 5).write.format("graft").save(dir + "_w")
    }
    assert(w.getMessage.contains("dims"))
    // INSERT INTO a USING-graft view is first-class (a manifested append —
    // GraftSqlSpec), but a layout written only through the raw API records
    // no clustering config: the insert must refuse with GUIDANCE, never
    // guess a clustering or drop raw parquet; reads stay untouched
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW ins_v USING graft " +
      s"OPTIONS (path '$dir')")
    val ins = intercept[Exception] {
      spark.sql("INSERT INTO ins_v VALUES (9999, 9999)")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ins).exists(_.contains("write configuration")))
    assert(spark.sql("SELECT count(*) FROM ins_v").head().getLong(0) == 120L)
  }
}
