package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.cli.LayoutCli
import graft.layout.DataLayout

/** End-to-end lifecycle through the ops CLI: every command against a real
  * layout dir, output contract included. */
class LayoutCliSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def cli(args: String*): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) {
      LayoutCli.run(LayoutCli.parseArgs(args.toArray), spark)
    }
    bos.toString("UTF-8")
  }

  test("write/append/delete/constraint/history/scan/travel/vacuum round-trip") {
    val root = Files.createTempDirectory("graft_lcli").toString
    val dir = root + "/t"
    (1 to 500).map(i => (i.toLong, (i * 7L) % 1000L, s"s${i % 10}"))
      .toDF("k", "amt", "tag").write.parquet(root + "/src")
    (501 to 550).map(i => (i.toLong, (i * 7L) % 1000L, s"s${i % 10}"))
      .toDF("k", "amt", "tag").write.parquet(root + "/delta")

    // write + append, with a string dim in the mix
    assert(cli("write", dir, "--from", root + "/src",
      "--dims", "k,str:tag", "--stats", "k,amt,tag", "--bits", "16",
      "--files", "4").contains(""""version":0"""))
    assert(cli("append", dir, "--from", root + "/delta",
      "--dims", "k,str:tag", "--stats", "k,amt,tag", "--bits", "16",
      "--files", "2").contains(""""version":1"""))
    assert(DataLayout.readLayout(spark, dir).count() == 550L)

    // constraints: add, list, a violating append refuses, drop
    assert(cli("constraint", dir, "add", "amt_cap", "amt < 1000")
      .contains("constraint-add"))
    assert(cli("constraint", dir, "list").contains("amt_cap"))
    (900 to 910).map(i => (i.toLong, 5000L, "bad")).toDF("k", "amt", "tag")
      .write.parquet(root + "/bad")
    intercept[IllegalArgumentException] {
      cli("append", dir, "--from", root + "/bad",
        "--dims", "k,str:tag", "--stats", "k,amt,tag", "--bits", "16")
    }
    assert(cli("constraint", dir, "drop", "amt_cap").contains("constraint-drop"))

    // soft delete, then scan honors the mask and prunes by range
    val del = cli("delete", dir, "--range", "k:1:50", "--soft")
    assert(del.contains(""""rows_deleted":50"""))
    val scan = cli("scan", dir, "--range", "k:1:100",
      "--out", root + "/scan_out")
    assert(scan.contains(""""rows":50"""))
    assert(spark.read.parquet(root + "/scan_out").count() == 50L)
    // string-range scan through the same manifest: s3-tagged survivors
    val sscan = cli("scan", dir, "--range", "tag:s3:s3")
    val want = DataLayout.readLayout(spark, dir)
      .where(col("tag") === "s3").count()
    assert(want > 0 && sscan.contains(s""""rows":$want"""))

    // history covers the three versions so far (v0 write, v1 append, v2 DV)
    val hist = cli("history", dir)
    assert(hist.linesIterator.size == 3 && hist.contains(""""version":2"""))

    // time travel back to v1: the soft-deleted rows are visible again
    val travel = cli("travel", dir, "--version", "1", "--out", root + "/v1")
    assert(travel.contains(""""rows":550"""))
    assert(spark.read.parquet(root + "/v1").count() == 550L)

    // compact + vacuum keep the latest content
    cli("compact", dir, "--dims", "k,str:tag", "--stats", "k,amt,tag",
      "--bits", "16", "--rows-per-file", "1000")
    cli("vacuum", dir)
    assert(DataLayout.readLayout(spark, dir).count() == 500L)

    // stats come from the manifest only
    assert(cli("stats", dir).contains("n_rows"))

    // one-shot CDC merge: update one key, insert one, delete one, and a
    // contested key where the later seq (delete) wins
    Seq(
      (60L, 77L, "s0", "U", 1L), (9001L, 1L, "s1", "I", 1L),
      (70L, 0L, "", "D", 1L),
      (80L, 5L, "s2", "U", 1L), (80L, 0L, "", "D", 2L))
      .toDF("k", "amt", "tag", "op", "seq").write.parquet(root + "/cdc")
    val m = cli("merge", dir, "--from", root + "/cdc", "--keys", "k",
      "--dims", "k,str:tag", "--stats", "k,amt,tag", "--bits", "16",
      "--files", "2")
    assert(m.contains(""""rows_deleted":2""") && m.contains(""""rows_inserted":1"""))
    val after = DataLayout.readLayout(spark, dir)
      .select("k", "amt").as[(Long, Long)].collect().toMap
    assert(after(60L) == 77L && after(9001L) == 1L &&
      !after.contains(70L) && !after.contains(80L))

    // contract errors are loud
    intercept[IllegalArgumentException] { cli("scan", dir) }
    intercept[IllegalArgumentException] { cli("nonsense", dir) }
    intercept[IllegalArgumentException] {
      LayoutCli.parseArgs(Array("history"))
    }
  }

  test("diff + verify: the nightly cross-layout check through the CLI") {
    val root = Files.createTempDirectory("graft_lcli").toString
    val a = root + "/a"; val b = root + "/b"
    (1 to 400).map(i => (i.toLong, i * 3L)).toDF("k", "amt")
      .write.parquet(root + "/src")
    cli("write", a, "--from", root + "/src", "--dims", "k", "--stats", "k",
      "--bits", "16", "--files", "4")
    // b = replica via init (stores the replication key for `verify`)
    graft.layout.Replica.init(spark, a, b,
      Seq(org.apache.spark.sql.functions.col("k")), 16, Seq("k"), Seq("k"),
      numFiles = 2)
    val clean = cli("verify", b)
    assert(clean.contains(""""clean":true""") &&
      clean.contains(""""files_read_src":0"""))
    // drift: delete on the source only, then diff + verify both see it
    cli("delete", a, "--range", "k:1:10", "--dims", "k", "--stats", "k",
      "--bits", "16")
    val drift = cli("verify", b, "--out", root + "/drift")
    assert(drift.contains(""""clean":false""") &&
      drift.contains(""""drift_rows":10"""))
    assert(spark.read.parquet(root + "/drift").count() == 10L)
    val d = cli("diff", a, b, "--keys", "k", "--compare", "amt")
    assert(d.contains(""""rows":10"""))
    // replica-sync ships the churn; verify goes clean again
    val s = cli("replica-sync", b, "--dims", "k", "--stats", "k", "--bits", "16")
    assert(s.contains(""""deletes":10"""))
    assert(cli("verify", b).contains(""""clean":true"""))
    // and a full CLI-only replica from scratch round-trips
    val c = root + "/c"
    val ri = cli("replica-init", c, "--from", a, "--dims", "k",
      "--stats", "k", "--keys", "k", "--bits", "16", "--files", "2")
    assert(ri.contains(""""op":"replica-init""""))
    assert(cli("verify", c).contains(""""clean":true"""))
    // nothing new to ship: sync is a no-op
    val s2 = cli("replica-sync", c, "--dims", "k", "--stats", "k", "--bits", "16")
    assert(s2.contains(""""feed_rows":0"""))
  }

  test("maintain: the one-shot nightly pass through the CLI, policy-gated") {
    val root = Files.createTempDirectory("graft_lcli").toString
    val dir = root + "/t"
    def part(ids: Range, p: String) =
      ids.map(i => (i.toLong, i.toLong)).toDF("k", "amt")
        .write.parquet(root + p)
    part(0 until 2000, "/base"); part(0 until 2000, "/ovl")
    cli("write", dir, "--from", root + "/base", "--dims", "amt",
      "--stats", "k,amt", "--bits", "16", "--files", "4")
    cli("append", dir, "--from", root + "/ovl", "--dims", "amt",
      "--stats", "k,amt", "--bits", "16", "--files", "4") // z-overlap debt
    cli("delete", dir, "--range", "amt:0:99", "--soft")   // DV debt
    // retain 0: the pass's own purge/compact tombstones are immediately
    // reclaimable, so the vacuum arm fires in the same run. (At retain>=1
    // the trigger correctly does NOT fire on tombstones still inside the
    // retention window — counting them anyway was the no-yield-vacuum
    // defect MaintenanceSpec pins.)
    val out = cli("maintain", dir, "--dims", "amt", "--stats", "k,amt",
      "--bits", "16", "--rows-per-file", "2000", "--retain", "0")
    assert(out.contains(""""purged":true"""))
    assert(out.contains(""""overlap_compacted":true"""))
    assert(out.contains(""""vacuumed":true"""))
    assert(DataLayout.readLayout(spark, dir).count() == 3800L)
    // a second pass finds nothing left to do
    val again = cli("maintain", dir, "--dims", "amt", "--stats", "k,amt",
      "--bits", "16", "--rows-per-file", "2000", "--retain", "0")
    assert(again.contains(""""purged":false"""))
    assert(again.contains(""""overlap_compacted":false"""))

    // bloom: build on the uncorrelated column, mutate, refresh catches up
    assert(cli("bloom", dir, "k").contains(""""files_indexed":"""))
    cli("compact", dir, "--dims", "amt", "--stats", "k,amt",
      "--bits", "16", "--rows-per-file", "500")
    val rf = cli("bloom", dir)
    assert(rf.contains(""""op":"bloom-refresh"""") && rf.contains(""""column":"k""""))
  }

  test("ingest --once: drain a landing dir exactly-once, re-runs pick up only new files") {
    val root = Files.createTempDirectory("graft_lcli").toString
    val landing = root + "/landing"
    val dir = root + "/t"
    // land FILES (not subdirs) in the landing root, as a producer would:
    // write to a temp dir, move the part file in
    def landFlat(ids: Range): Unit = {
      val tmp = Files.createTempDirectory("graft_land").toString
      ids.map(i => (i.toLong, (i * 7L) % 1000L)).toDF("k", "amt")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val fs = new org.apache.hadoop.fs.Path(landing)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
      for (f <- new java.io.File(tmp).listFiles
           if f.getName.endsWith(".parquet"))
        fs.rename(new org.apache.hadoop.fs.Path(f.getAbsolutePath),
          new org.apache.hadoop.fs.Path(s"$landing/${f.getName}"))
    }
    landFlat(0 until 400)
    val out1 = cli("ingest", dir, "--from", landing, "--dims", "amt",
      "--stats", "k,amt", "--files", "2", "--once")
    assert(out1.contains(""""rows_total":400"""))
    assert(DataLayout.readLayout(spark, dir).count() == 400L)
    // a re-run with nothing new is a no-op (the checkpoint remembers)
    val out2 = cli("ingest", dir, "--from", landing, "--dims", "amt",
      "--stats", "k,amt", "--files", "2", "--once")
    assert(out2.contains(""""rows_total":400"""))
    // new files land; old ones are NOT re-ingested
    landFlat(1000 until 1300)
    val out3 = cli("ingest", dir, "--from", landing, "--dims", "amt",
      "--stats", "k,amt", "--files", "2", "--once")
    assert(out3.contains(""""rows_total":700"""))
    val ks = DataLayout.readLayout(spark, dir)
    assert(ks.count() == 700L && ks.select("k").distinct().count() == 700L)
  }

  test("constraint list emits valid JSON even with quoted/backslashed predicates") {
    val root = Files.createTempDirectory("graft_lcli").toString
    val dir = root + "/t"
    (1 to 20).map(i => (i.toLong, s"v$i")).toDF("k", "tag")
      .write.parquet(root + "/src")
    cli("write", dir, "--from", root + "/src", "--dims", "k",
      "--stats", "k,tag", "--bits", "16", "--files", "1")
    cli("constraint", dir, "add", "no_quote", """tag <> 'x"y\z'""")
    val out = cli("constraint", dir, "list").trim
    // the line must parse as JSON: quotes and backslashes escaped
    assert(out == """{"name":"no_quote","expr":"tag <> 'x\"y\\z'"}""")
  }
}
