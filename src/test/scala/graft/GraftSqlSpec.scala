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

  test("DELETE with no DVs outstanding is ONE atomic rewrite version; with DVs it still ends DV-free") {
    // fast path (r20): no outstanding DVs -> a single rewrite version
    val dir = Files.createTempDirectory("graft_sql").toString + "/t"
    writeSql(dir, 0 until 1000)
    val v0 = DataLayout.currentVersion(spark, dir)
    val rep = GraftSql(spark,
      s"DELETE FROM graft.`$dir` WHERE id BETWEEN 100 AND 199")
    assert(rep.head().getAs[Long]("rows_deleted") == 100L)
    assert(DataLayout.currentVersion(spark, dir) == v0 + 1,
      "no-DV DELETE must land as exactly one version")
    assert(!DataLayout.dvEffectiveAt(spark, dir))
    assert(DataLayout.readLayout(spark, dir).count() == 900L)
    // fallback: with effective DVs outstanding the mark+purge path runs
    // and the layout still ends DV-free (the plain-relation-view contract)
    DataLayout.deleteVectors(spark, dir, Seq(("x", 0L, 500L)))
    assert(DataLayout.dvEffectiveAt(spark, dir))
    val before = DataLayout.readLayout(spark, dir).count()
    val rep2 = GraftSql(spark,
      s"DELETE FROM graft.`$dir` WHERE id BETWEEN 200 AND 299")
    val del2 = rep2.head().getAs[Long]("rows_deleted")
    assert(DataLayout.readLayout(spark, dir).count() == before - del2)
    assert(!DataLayout.dvEffectiveAt(spark, dir),
      "DELETE over outstanding DVs must still end the layout DV-free")
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
    // partial SET no longer refuses (r18 general path) — it routes
    // through the derived-source rewrite and keeps unnamed columns
    val rep2 = GraftSql(spark,
      s"""MERGE INTO $v USING ${v}_src s ON $v.id = s.id
         |WHEN MATCHED THEN UPDATE SET p = s.p""".stripMargin)
    assert(rep2.head().getAs[Long]("rows_updated") == 200L)
    // a non-equi ON still refuses loudly (no defined key to merge on)
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

  test("MERGE general shape: conditional arms + partial SET, one atomic version") {
    val dir = Files.createTempDirectory("graft_sql").toString + "/t"
    writeSql(dir, 0 until 1000)
    val v = freshView(dir)
    // a real CDC batch: tombstones, partial updates, inserts — the shape
    // the canonical-only surface refused in r17
    Seq((5L, "D", 0L), (6L, "U", 999L), (7L, "U", 888L),
      (2000L, "I", 111L), (2001L, "X", 1L)) // 'X': matches no arm
      .toDF("id", "op", "newx").createOrReplaceTempView("gsql_cdc")
    val v0 = DataLayout.currentVersion(spark, dir)
    val rep = GraftSql(spark,
      s"""MERGE INTO $v t USING gsql_cdc s ON t.id = s.id
         |WHEN MATCHED AND s.op = 'D' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET x = s.newx
         |WHEN NOT MATCHED AND s.op = 'I' THEN INSERT (id, x)
         |  VALUES (s.id, s.newx)""".stripMargin)
    val r = rep.head()
    assert(r.getAs[Long]("rows_deleted") == 1L)
    assert(r.getAs[Long]("rows_updated") == 2L)
    assert(r.getAs[Long]("rows_inserted") == 1L)
    // everything landed as ONE version
    assert(DataLayout.currentVersion(spark, dir) == v0 + 1)
    val back = DataLayout.readLayout(spark, dir)
    assert(back.count() == 1000L) // -1 delete, +1 insert
    assert(back.where(col("id") === 5L).isEmpty)
    // partial SET: x updated, the unnamed p column KEPT from the target
    assert(back.where(col("id") === 6L).select("x", "p")
      .as[(Long, String)].head() == ((999L, "p6")))
    assert(back.where(col("id") === 7L).select("x", "p")
      .as[(Long, String)].head() == ((888L, "p7")))
    // explicit INSERT column list: unnamed columns land NULL
    val ins = back.where(col("id") === 2000L).select("x", "p").head()
    assert(ins.getLong(0) == 111L && ins.isNullAt(1))
    // 'X' rows: not matched + no matching insert arm -> not inserted
    assert(back.where(col("id") === 2001L).isEmpty)
  }

  test("MERGE general shape: first-match-wins, untouched non-matching rows, refusals") {
    val dir = Files.createTempDirectory("graft_sql").toString + "/t"
    writeSql(dir, 0 until 300)
    val v = freshView(dir)
    Seq((10L, "D"), (11L, "Z")).toDF("id", "op")
      .createOrReplaceTempView("gsql_ops")
    // 11 matches the target but satisfies NO arm: must stay untouched
    val rep = GraftSql(spark,
      s"""MERGE INTO $v t USING gsql_ops s ON t.id = s.id
         |WHEN MATCHED AND s.op = 'D' THEN DELETE""".stripMargin)
    assert(rep.head().getAs[Long]("rows_deleted") == 1L)
    val back = DataLayout.readLayout(spark, dir)
    assert(back.where(col("id") === 10L).isEmpty)
    assert(back.where(col("id") === 11L).count() == 1L)
    // ambiguous unqualified column (x lives on both sides) refuses loudly
    mk(0 until 5).createOrReplaceTempView("gsql_amb")
    val e = intercept[Exception] {
      GraftSql(spark,
        s"""MERGE INTO $v t USING gsql_amb s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET x = x + 1""".stripMargin)
    }
    assert(chainMsg(e).contains("ambiguous"), chainMsg(e))
    // qualified, it works — values may reference both sides
    val rep2 = GraftSql(spark,
      s"""MERGE INTO $v t USING gsql_amb s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET x = t.x + s.x + 1""".stripMargin)
    assert(rep2.head().getAs[Long]("rows_updated") == 5L)
    val got = DataLayout.readLayout(spark, dir).where(col("id") === 3L)
      .select("x").as[Long].head()
    assert(got == (3 * 13L) % 65536L * 2 + 1)
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
