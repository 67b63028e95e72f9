package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.layout.DataLayout

/** The WRITE side of `format("graft")`: batch `df.write` SaveMode
  * semantics, the exactly-once streaming sink, and the transaction-marker
  * dedup contract ([[DataLayout.appendZOrderedTxn]]). */
class GraftWriteSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def mk(ids: Range) =
    ids.map(i => (i.toLong, (i * 13L) % 65536L)).toDF("id", "x")

  test("batch writer: SaveMode overwrite/append/errorifexists/ignore against the version log") {
    val dir = Files.createTempDirectory("graft_w").toString + "/t"
    def w(df: org.apache.spark.sql.DataFrame, mode: String) =
      df.write.format("graft").mode(mode)
        .option("dims", "x").option("statsCols", "id,x")
        .option("numFiles", 2).save(dir)
    w(mk(0 until 1000), "overwrite") // v0
    assert(DataLayout.currentVersion(spark, dir) == 0L)
    w(mk(1000 until 1200), "append") // v1
    assert(DataLayout.currentVersion(spark, dir) == 1L)
    assert(spark.read.format("graft").load(dir).count() == 1200L)
    // time travel still sees v0 alone
    assert(spark.read.format("graft").option("versionAsOf", 0).load(dir)
      .count() == 1000L)
    // errorifexists refuses on a live layout; ignore no-ops
    intercept[IllegalStateException] { w(mk(0 until 10), "errorifexists") }
    w(mk(0 until 10), "ignore")
    assert(spark.read.format("graft").load(dir).count() == 1200L)
    // the write came out properly manifested: skip-scan prunes and matches
    val scan = DataLayout.skipScan(spark, dir, Seq(("x", 0L, 100L)))
    assert(scan.filesRead < scan.filesTotal)
    assert(scan.df.count() ==
      spark.read.format("graft").load(dir).where($"x" <= 100).count())
  }

  test("streaming sink: each micro-batch is one committed version; rows land exactly once") {
    val base = Files.createTempDirectory("graft_sink").toString
    val dir = base + "/t"
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val q = input.toDF().toDF("id", "x").writeStream.format("graft")
      .option("dims", "x").option("statsCols", "id,x")
      .option("filesPerBatch", 2)
      .option("checkpointLocation", base + "/ckpt")
      .start(dir)
    try {
      for (b <- 0 until 3) {
        input.addData((0 until 300).map(i => (b * 1000L + i, (b * 7919L + i * 13L) % 65536L)))
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(DataLayout.readLayout(spark, dir).count() == 900L)
    // three micro-batches → versions 0,1,2; the marker tracks the last batch
    assert(DataLayout.currentVersion(spark, dir) == 2L)
    val app = base + "/ckpt"
    assert(DataLayout.lastCommittedTxn(spark, dir, app).contains(2L))
    // every version is an ordinary layout commit: the change feed replays them
    val feed = DataLayout.changeFeed(spark, dir, 0L, 2L, Seq("id"), Seq("x"))
    assert(feed.where($"sign" === "+").count() == 600L) // batches 1 and 2
  }

  test("transaction markers are exactly-once and per-app") {
    val dir = Files.createTempDirectory("graft_txn").toString + "/t"
    val dims = Seq(col("x"))
    def append(batch: Long, ids: Range, app: String = "appA") =
      DataLayout.appendZOrderedTxn(mk(ids), dims, 16, Seq("id", "x"),
        dir, 1, app, batch)
    assert(append(0L, 0 until 100))  // bootstraps v0
    assert(append(1L, 100 until 200))
    assert(DataLayout.readLayout(spark, dir).count() == 200L)
    // a replay of batch 1 (crash between addBatch and checkpoint commit)
    // is skipped whole — no rows, no version, and no orphan data files
    // visible to a plain parquet reader of the dir
    assert(!append(1L, 100 until 200))
    assert(!append(0L, 0 until 100))
    assert(DataLayout.readLayout(spark, dir).count() == 200L)
    assert(spark.read.parquet(dir).count() == 200L)
    assert(DataLayout.currentVersion(spark, dir) == 1L)
    // markers key on the app id: a DIFFERENT app reusing batch 1 appends
    assert(append(1L, 200 until 250, app = "appB"))
    assert(DataLayout.readLayout(spark, dir).count() == 250L)
    assert(DataLayout.lastCommittedTxn(spark, dir, "appA").contains(1L))
    assert(DataLayout.lastCommittedTxn(spark, dir, "appB").contains(1L))
    // history carries provenance: which app/batch wrote each version
    val prov = DataLayout.history(spark, dir)
      .select("version", "txn_app", "txn_batch")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(prov(0L) == (Some("appA"), 0L) && prov(1L) == (Some("appA"), 1L))
    assert(prov(2L)._1.contains("appB"))
    // markers survive unrelated commits in between
    DataLayout.appendZOrdered(mk(300 until 310), dims, 16, Seq("id", "x"), dir, 1)
    assert(!append(1L, 100 until 200))
    assert(append(2L, 400 until 410))
    // ...and survive a rewrite + vacuum erasing the rows that carried
    // them: compaction tombstones every txn-marked file, vacuum(0)
    // reclaims them, yet the committed-batch high-water must endure —
    // otherwise a zombie replay would re-land after the nightly OPTIMIZE
    DataLayout.compactZOrdered(spark, dir, dims, 16, Seq("id", "x"), 100000L)
    DataLayout.vacuum(spark, dir, retainVersions = 0)
    assert(DataLayout.lastCommittedTxn(spark, dir, "appA").contains(2L))
    assert(DataLayout.lastCommittedTxn(spark, dir, "appB").contains(1L))
    assert(!append(2L, 400 until 410))
    assert(!append(1L, 200 until 250, app = "appB"))
    assert(append(3L, 500 until 510))
  }

  test("sink maintainEvery: inline policy pass pays the small-file debt the stream makes") {
    val base = Files.createTempDirectory("graft_sinkm").toString
    val dir = base + "/t"
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val q = input.toDF().toDF("id", "x").writeStream.format("graft")
      .option("dims", "x").option("statsCols", "id,x")
      .option("filesPerBatch", 4)           // 4 small files per batch
      .option("maintainEvery", 4)           // policy pass after batch 3
      .option("rowsPerFile", 2000)
      .option("checkpointLocation", base + "/ckpt")
      .start(dir)
    try {
      for (b <- 0 until 4) { // overlapping x ranges: both debt classes
        input.addData((0 until 400).map(i => (b * 1000L + i, (i * 13L) % 5000L)))
        q.processAllAvailable()
      }
    } finally q.stop()
    // 16 small overlapping files went in; the pass merged them
    val files = DataLayout.aliveManifest(spark, dir).count()
    assert(files < 16L, s"maintenance did not compact: $files files alive")
    // rows exact, keys unique — maintenance moved files, never rows
    val out = DataLayout.readLayout(spark, dir)
    assert(out.count() == 1600L && out.select("id").distinct().count() == 1600L)
    // versions advanced past the 4 appends (maintenance commits are real
    // versions) and the txn marker still tracks the LAST DATA batch
    assert(DataLayout.lastCommittedTxn(spark, dir, base + "/ckpt").contains(3L))
  }

  test("sink with inline maintenance RACING a batch appender: both land, every row once") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val base = Files.createTempDirectory("graft_sinkrace").toString
    val dir = base + "/t"
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    // maintainEvery=2: the sink's inline compaction races the external
    // appender — the exact deployment the row-preserving OCC retry
    // exists for (a lost race to an append re-validates and re-commits;
    // before it, inline maintenance forced a strict single-mutator world)
    val q = input.toDF().toDF("id", "x").writeStream.format("graft")
      .option("dims", "x").option("statsCols", "id,x")
      .option("filesPerBatch", 2)
      .option("maintainEvery", 2)
      .option("rowsPerFile", 4000)
      .option("checkpointLocation", base + "/ckpt")
      .start(dir)
    val appender = Future {
      for (b <- 0 until 6) {
        DataLayout.appendZOrdered(
          (0 until 200).map(i => (100000L + b * 1000 + i, (i * 7L) % 5000L))
            .toDF("id", "x"),
          Seq(col("x")), 24, Seq("id", "x"), dir, 1)
        Thread.sleep(50)
      }
    }
    try {
      for (b <- 0 until 8) { // overlapping x ranges: real compaction work
        input.addData((0 until 300).map(i => (b * 1000L + i, (i * 13L) % 5000L)))
        q.processAllAvailable()
      }
      Await.result(appender, 300.seconds)
    } finally q.stop()
    // stream 8×300 + batch 6×200 — all present exactly once
    val out = DataLayout.readLayout(spark, dir)
    assert(out.count() == 3600L, s"rows lost/duplicated: ${out.count()}")
    assert(out.select("id").distinct().count() == 3600L)
    // the exactly-once ledger survived the interleaving
    assert(DataLayout.lastCommittedTxn(spark, dir, base + "/ckpt").contains(7L))
  }

  test("layout-to-layout pipeline: changefeed source |> graft sink, format() strings only") {
    val root = Files.createTempDirectory("graft_pipe").toString
    val src = root + "/src"
    val dst = root + "/dst"
    val dims = Seq(col("x"))
    DataLayout.writeZOrdered(mk(0 until 500), dims, 16, Seq("id", "x"), src, 4) // v0
    DataLayout.appendZOrdered(mk(500 until 700), dims, 16, Seq("id", "x"), src, 2) // v1

    // an append-only mirror spelled ENTIRELY in public format() strings:
    // no DataLayout call, no foreachBatch — the two streaming halves meet
    def run(): Unit = {
      val q = spark.readStream.format("graft-changefeed")
        .option("path", src).option("keyCols", "id")
        .option("startingVersion", "-1") // bootstrap: v0 snapshot streams as '+'
        .load()
        .where($"sign" === "+").select("id", "x")
        .writeStream.format("graft")
        .option("dims", "x").option("statsCols", "id,x")
        .option("filesPerBatch", 2)
        .option("checkpointLocation", root + "/ckpt")
        .start(dst)
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(DataLayout.readLayout(spark, dst).count() == 700L)
    // exactly-once across a RESTART: new source versions ship, the ones
    // already checkpointed (and txn-marked) do not double
    DataLayout.appendZOrdered(mk(700 until 800), dims, 16, Seq("id", "x"), src, 2) // v2
    run()
    val out = DataLayout.readLayout(spark, dst)
    assert(out.count() == 800L)
    assert(out.select("id").distinct().count() == 800L)
    // the mirror is a true layout: manifested, skip-scannable
    val scan = DataLayout.skipScan(spark, dst, Seq(("x", 0L, 50L)))
    assert(scan.filesRead < scan.filesTotal)
  }

  test("sink restart chaos: random stop/start cycles land every row exactly once") {
    val base = Files.createTempDirectory("graft_chaos").toString
    val dir = base + "/t"
    val ckpt = base + "/ckpt"
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(1616L)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    def start() = input.toDF().toDF("id", "x").writeStream.format("graft")
      .option("dims", "x").option("statsCols", "id,x")
      .option("filesPerBatch", 2)
      .option("checkpointLocation", ckpt)
      .start(dir)
    var q = start()
    var expected = 0L
    try {
      for (round <- 0 until 8) {
        // 1-3 addData calls per round: batch boundaries vary run to run
        for (_ <- 0 to rnd.nextInt(2)) {
          val n = 50 + rnd.nextInt(150)
          input.addData((0 until n).map(i =>
            (expected + i, rnd.nextLong(1 << 16))))
          expected += n
        }
        q.processAllAvailable()
        // the REAL recovery path: stop the query, restart from the
        // checkpoint — StreamExecution replays any uncommitted batch and
        // the sink's txn markers must keep every replay a no-op
        if (rnd.nextBoolean()) { q.stop(); q = start() }
        val out = DataLayout.readLayout(spark, dir)
        assert(out.count() == expected, s"round $round: row count drifted")
        assert(out.select("id").distinct().count() == expected,
          s"round $round: duplicates landed")
      }
    } finally q.stop()
    // plain parquet readers agree: no unmanifested residue either
    assert(spark.read.parquet(dir).count() == expected)
  }

  test("empty deltas: a plain append is a version-free no-op; a txn batch still advances the ledger") {
    val dir = Files.createTempDirectory("graft_empty").toString + "/t"
    val dims = Seq(col("x"))
    DataLayout.writeZOrdered(mk(0 until 100), dims, 16, Seq("id", "x"), dir, 1)
    val v0 = DataLayout.currentVersion(spark, dir)
    // plain empty append: nothing to say, no version burned
    DataLayout.appendZOrdered(mk(0 until 0), dims, 16, Seq("id", "x"), dir, 1)
    assert(DataLayout.currentVersion(spark, dir) == v0)
    // empty TXN batch: the exactly-once ledger must advance anyway (a
    // restart would otherwise re-offer the batch forever) — as a
    // never-alive sentinel row, no data file
    assert(DataLayout.appendZOrderedTxn(mk(0 until 0), dims, 16,
      Seq("id", "x"), dir, 1, "empty_app", 3L))
    assert(DataLayout.lastCommittedTxn(spark, dir, "empty_app").contains(3L))
    assert(!DataLayout.appendZOrderedTxn(mk(100 until 150), dims, 16,
      Seq("id", "x"), dir, 1, "empty_app", 3L)) // replay skips
    assert(DataLayout.readLayout(spark, dir).count() == 100L)
    assert(spark.read.parquet(dir).count() == 100L) // no orphan data file
    // the sentinel never surfaces as a data file anywhere
    assert(DataLayout.aliveManifest(spark, dir).where(
      col("file").startsWith("_graft_")).isEmpty)
    // a later real batch under the same app lands normally
    assert(DataLayout.appendZOrderedTxn(mk(200 until 250), dims, 16,
      Seq("id", "x"), dir, 1, "empty_app", 4L))
    assert(DataLayout.readLayout(spark, dir).count() == 150L)
  }

  test("misconfigured write options fail at the surface, never at runtime") {
    val dir = Files.createTempDirectory("graft_w").toString + "/t"
    def w(opts: (String, String)*) = {
      val wr = mk(0 until 10).write.format("graft").mode("overwrite")
        .option("dims", "x")
      opts.foldLeft(wr) { case (b, (k, v)) => b.option(k, v) }.save(dir)
    }
    // maintainEvery=0 used to pass parsing and throw ArithmeticException
    // (batchId % 0) inside the sink's addBatch — killing the streaming
    // query at its FIRST committed batch instead of at start()
    intercept[IllegalArgumentException] { w("maintainEvery" -> "0") }
    intercept[IllegalArgumentException] { w("maintainEvery" -> "-3") }
    intercept[IllegalArgumentException] { w("rowsPerFile" -> "0") }
    intercept[IllegalArgumentException] { w("filesPerBatch" -> "0") }
    intercept[IllegalArgumentException] { w("maintainRetain" -> "-1") }
    w() // the clean spelling still lands
    assert(DataLayout.currentVersion(spark, dir) == 0L)
  }

  test("sink refuses non-append modes and demands dims + a stable app id") {
    val base = Files.createTempDirectory("graft_sinkopt").toString
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    // missing dims: surfaces on start
    val e = intercept[Exception] {
      input.toDF().toDF("id", "x").writeStream.format("graft")
        .option("checkpointLocation", base + "/c1").start(base + "/t1")
    }
    assert(e.getMessage.contains("dims"))
    // complete mode refused
    val e2 = intercept[Exception] {
      input.toDF().toDF("id", "x").groupBy($"x").count()
        .writeStream.format("graft").outputMode("complete")
        .option("dims", "x")
        .option("checkpointLocation", base + "/c2").start(base + "/t2")
    }
    assert(e2.getMessage.toLowerCase.contains("append"))
  }
}
