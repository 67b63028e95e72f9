package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.layout.{DataLayout, GraftSql, LayoutConfig}

/** SQL DML on `USING graft` views: INSERT INTO rides the native
  * InsertableRelation (a manifested append, never a raw parquet drop);
  * DELETE FROM / MERGE INTO go through [[GraftSql]] onto deletion
  * vectors + purge and the envelope-targeted merge. */
class GraftSqlSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def mk(ids: Range) =
    ids.map(i => (i.toLong, (i * 13L) % 65536L, s"p$i")).toDF("id", "x", "p")

  private var n = 0
  private def freshView(dir: String): String = {
    n += 1
    val v = s"gsql_v$n"
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $v USING graft OPTIONS (path '$dir')")
    v
  }

  private def writeSql(dir: String, ids: Range): Unit =
    mk(ids).write.format("graft").mode("overwrite")
      .option("dims", "x").option("statsCols", "id,x")
      .option("numFiles", "4").save(dir)

  /** Messages through the whole cause chain — Spark may wrap a command's
    * exception before it surfaces. */
  private def chainMsg(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")

  test("INSERT INTO lands a manifested, versioned append; the view sees it") {
    val dir = Files.createTempDirectory("graft_sql").toString + "/t"
    writeSql(dir, 0 until 1000)
    val v = freshView(dir)
    mk(1000 until 1200).createOrReplaceTempView(s"${v}_delta")
    spark.sql(s"INSERT INTO $v SELECT * FROM ${v}_delta")
    // one new version, manifested rows — not a raw parquet drop
    assert(DataLayout.currentVersion(spark, dir) == 1L)
    assert(spark.sql(s"SELECT count(*) FROM $v").head().getLong(0) == 1200L)
    assert(DataLayout.readLayout(spark, dir).count() == 1200L)
    // time travel still sees v0 alone
    assert(DataLayout.readLayout(spark, dir, 0L).count() == 1000L)
    // and the inserted files are stats-manifested: a skip-scan prunes
    val scan = DataLayout.skipScan(spark, dir, Seq(("x", 0L, 50L)))
    assert(scan.filesRead < scan.filesTotal)
  }

  test("INSERT INTO a time-travel view refuses; insert without config refuses") {
    val dir = Files.createTempDirectory("graft_sql").toString + "/t"
    writeSql(dir, 0 until 100)
    mk(100 until 110).write.format("graft").mode("append")
      .option("dims", "x").save(dir) // v1
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW gsql_tt USING graft " +
      s"OPTIONS (path '$dir', versionAsOf '0')")
    mk(200 until 201).createOrReplaceTempView("gsql_tt_delta")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gsql_tt SELECT * FROM gsql_tt_delta")
    }
    assert(chainMsg(e).contains("time-travel"))
    // a layout written only through the raw API records no config
    val raw = Files.createTempDirectory("graft_sql").toString + "/raw"
    DataLayout.writeZOrdered(mk(0 until 50), Seq(col("x")), 16,
      Seq("id", "x"), raw, 2)
    val vr = freshView(raw)
    val e2 = intercept[Exception] {
      spark.sql(s"INSERT INTO $vr SELECT * FROM gsql_tt_delta")
    }
    assert(chainMsg(e2).contains("write configuration"))
  }

  test("DELETE FROM: DV-mark + targeted purge; the view and time travel stay exact") {
    val dir = Files.createTempDirectory("graft_sql").toString + "/t"
    writeSql(dir, 0 until 2000)
    val v = freshView(dir)
    val rep = GraftSql(spark,
      s"DELETE FROM $v WHERE x BETWEEN 100 AND 2000 AND id % 2 = 0")
    val want = (0 until 2000).map(_.toLong).filterNot(i =>
      (i * 13L) % 65536L >= 100L && (i * 13L) % 65536L <= 2000L && i % 2 == 0)
    assert(rep.head().getAs[Long]("rows_deleted") == (2000 - want.size).toLong)
    // the SAME view answers correctly (refresh) — and so does a plain read
    assert(spark.sql(s"SELECT count(*) FROM $v").head().getLong(0) ==
      want.size.toLong)
    assert(DataLayout.readLayout(spark, dir).select("id").as[Long]
      .collect().sorted.toSeq == want)
    // purge ran: no effective DVs remain at latest
    assert(!DataLayout.dvEffectiveAt(spark, dir))
    // the pre-delete version still reads whole
    assert(DataLayout.readLayout(spark, dir, 0L).count() == 2000L)
  }

  test("UPDATE: one atomic version, only match-carrying files rewrite, expressions evaluate per row") {
    val dir = Files.createTempDirectory("graft_sql").toString + "/t"
    writeSql(dir, 0 until 2000)
    val v = freshView(dir)
    val before = DataLayout.aliveManifest(spark, dir).count()
    val rep = GraftSql(spark,
      s"UPDATE $v SET p = 'upd', x = x + 100000 WHERE x BETWEEN 0 AND 99")
    val wantIds = (0 until 2000).map(_.toLong)
      .filter(i => (i * 13L) % 65536L <= 99L)
    assert(rep.head().getAs[Long]("rows_updated") == wantIds.size.toLong)
    // ONE new version (atomic), count preserved
    assert(DataLayout.currentVersion(spark, dir) == 1L)
    assert(spark.sql(s"SELECT count(*) FROM $v").head().getLong(0) == 2000L)
    // the row-level transform applied exactly to matches (x shifted, so
    // re-select by the shifted range; p set; other rows untouched)
    val got = DataLayout.readLayout(spark, dir)
      .where(col("p") === "upd").select("id", "x").as[(Long, Long)]
      .collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == wantIds)
    assert(got.forall { case (i, x) => x == (i * 13L) % 65536L + 100000L })
    // x-clustered layout: the 0..99 band lives in a subset of the 4 files
    val hist = DataLayout.history(spark, dir)
      .where(col("version") === 1L).head()
    assert(hist.getAs[Long]("files_removed") < before,
      "UPDATE rewrote every file — envelope targeting regressed")
    // UPDATE without WHERE touches everything; time travel intact
    GraftSql(spark, s"UPDATE $v SET p = 'all'")
    assert(spark.sql(s"SELECT count(*) FROM $v WHERE p = 'all'")
      .head().getLong(0) == 2000L)
    assert(DataLayout.readLayout(spark, dir, 0L)
      .where(col("p") === "upd").count() == 0L)
  }

  test("MERGE INTO: canonical upsert updates matched and inserts fresh keys") {
    val dir = Files.createTempDirectory("graft_sql").toString + "/t"
    writeSql(dir, 0 until 1000)
    val v = freshView(dir)
    mk(900 until 1100).withColumn("p", lit("merged"))
      .createOrReplaceTempView(s"${v}_src")
    val rep = GraftSql(spark,
      s"""MERGE INTO $v USING ${v}_src s ON $v.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val r = rep.head()
    assert(r.getAs[Long]("rows_updated") == 100L)
    assert(r.getAs[Long]("rows_inserted") == 100L)
    assert(spark.sql(s"SELECT count(*) FROM $v").head().getLong(0) == 1100L)
    assert(spark.sql(
      s"SELECT count(*) FROM $v WHERE p = 'merged'").head().getLong(0) == 200L)
    // non-canonical shapes refuse loudly
    intercept[IllegalArgumentException] {
      GraftSql(spark, s"""MERGE INTO $v USING ${v}_src s ON $v.id = s.id
        |WHEN MATCHED THEN UPDATE SET p = s.p""".stripMargin)
    }
    intercept[IllegalArgumentException] {
      GraftSql(spark, s"""MERGE INTO $v USING ${v}_src s ON $v.id < s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
  }

  test("MERGE WHEN MATCHED THEN DELETE removes by key; graft.`path` spelling works") {
    val dir = Files.createTempDirectory("graft_sql").toString + "/t"
    writeSql(dir, 0 until 500)
    spark.range(100, 150).select(col("id"))
      .createOrReplaceTempView("gsql_gone")
    val rep = GraftSql(spark,
      s"""MERGE INTO graft.`$dir` USING gsql_gone g ON graft.id = g.id
         |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(rep.head().getAs[Long]("rows_deleted") == 50L)
    val left = DataLayout.readLayout(spark, dir).select("id").as[Long]
      .collect().sorted.toSeq
    assert(left == ((0L until 100L) ++ (150L until 500L)))
  }

  test("LayoutConfig round-trips and the sink records it") {
    val dir = Files.createTempDirectory("graft_sql").toString + "/t"
    val c = LayoutConfig.Config(Seq("x", "str:p"), 20, Seq("id", "x"), 7)
    LayoutConfig.record(spark, dir, c)
    assert(LayoutConfig.read(spark, dir).contains(c))
    // last writer wins
    val c2 = c.copy(bits = 24)
    LayoutConfig.record(spark, dir, c2)
    assert(LayoutConfig.read(spark, dir).contains(c2))
  }
}
