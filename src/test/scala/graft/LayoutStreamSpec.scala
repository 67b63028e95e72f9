package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.layout.DataLayout

class LayoutStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private val dims = Seq(col("k"))
  private def write(dir: String, rows: Seq[(Long, Long)]): Unit =
    DataLayout.writeZOrdered(rows.toDF("k", "amt"), dims, 16,
      statsCols = Seq("k"), outDir = dir, numFiles = 2)
  private def append(dir: String, rows: Seq[(Long, Long)]): Unit =
    DataLayout.appendZOrdered(rows.toDF("k", "amt"), dims, 16,
      statsCols = Seq("k"), outDir = dir, numFiles = 1)

  test("readStream tails the layout: versions become micro-batches of signed rows") {
    val root = Files.createTempDirectory("graft_lstream").toString
    val dir = root + "/t"
    write(dir, (1L to 100L).map(i => (i, i * 10)))            // v0
    // startingVersion = -1 bootstraps with the initial snapshot as '+'
    val feed = spark.readStream.format("graft-changefeed")
      .option("path", dir).option("keyCols", "k")
      .option("startingVersion", "-1")
      .load()
    assert(feed.isStreaming)
    assert(feed.columns.toSeq == Seq("sign", "k", "amt", "version"))
    // parquet sink: the one built-in sink that supports checkpoint
    // recovery, which the restart half of this test exercises
    def start() = feed.writeStream.format("parquet")
      .option("path", root + "/out")
      .option("checkpointLocation", root + "/ck")
      .outputMode("append").start()
    val q = start()
    def table() = spark.read.parquet(root + "/out")
      .select("sign", "k", "amt", "version")
      .as[(String, Long, Long, Long)].collect().toSet
    try {
      q.processAllAvailable()
      // snapshot batch: all 100 rows '+' at version 0
      assert(table() == (1L to 100L).map(i => ("+", i, i * 10, 0L)).toSet)
      // v1: append 5 rows -> 5 '+' rows at version 1
      append(dir, (201L to 205L).map(i => (i, i)))
      q.processAllAvailable()
      assert(table().count(_._4 == 1L) == 5)
      // v2: soft-delete two rows -> 2 '-' rows at version 2
      DataLayout.deleteVectors(spark, dir, Seq(("k", 10L, 11L)))
      q.processAllAvailable()
      assert(table().filter(_._4 == 2L) ==
        Set(("-", 10L, 100L, 2L), ("-", 11L, 110L, 2L)))
      // v3: recluster rewrites every file but moves no rows -> the
      // version streams as an EMPTY batch
      DataLayout.recluster(spark, dir, Seq(col("amt")), 16, Seq("k"), 1)
      assert(DataLayout.currentVersion(spark, dir) == 3L)
      q.processAllAvailable()
      assert(!table().exists(_._4 == 3L))
    } finally q.stop()

    // restart from the checkpoint: nothing replays, new churn streams on
    val before = table()
    append(dir, Seq((300L, 1L)))                               // v4
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got = table() -- before
      assert(got == Set(("+", 300L, 1L, 4L))) // only the post-restart version
    } finally q2.stop()
  }

  test("default start is 'now': an already-written history does not replay") {
    val root = Files.createTempDirectory("graft_lstream").toString
    val dir = root + "/t"
    write(dir, (1L to 50L).map(i => (i, i)))                   // v0
    append(dir, Seq((60L, 60L)))                               // v1
    val feed = spark.readStream.format("graft-changefeed")
      .option("path", dir).option("keyCols", "k").load()
    val q = feed.writeStream.format("memory").queryName("lfeed3")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("lfeed3").isEmpty) // history before start skipped
      append(dir, Seq((61L, 61L)))                             // v2
      q.processAllAvailable()
      assert(spark.table("lfeed3").select("k").as[Long].collect().toSeq ==
        Seq(61L))
    } finally q.stop()
  }

  test("maxVersionsPerBatch paces a backlog in bounded bites") {
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val root = Files.createTempDirectory("graft_lstream").toString
    val dir = root + "/t"
    write(dir, (1L to 20L).map(i => (i, i)))                   // v0
    for (b <- 1 to 4) append(dir, Seq((100L + b, b)))          // v1..v4 backlog
    // drive the Source protocol directly (the engine's own loop is
    // covered by the other tests; pacing is deterministic this way)
    val src = new graft.layout.LayoutChangeFeedProvider().createSource(
      spark.sqlContext, root + "/meta", None, "graft-changefeed",
      Map("path" -> dir, "keyCols" -> "k",
        "startingVersion" -> "0", "maxVersionsPerBatch" -> "1"))
    def off(o: Option[org.apache.spark.sql.execution.streaming.Offset]) =
      o.map { case l: LongOffset => l.offset }.get
    // before any batch the cap base is unknown: the full backlog is offered
    assert(off(src.getOffset) == 4L)
    // anchor the base at the start, then every offer advances by ONE step
    // (the batches' CONTENT is covered by the engine-driven tests above —
    // a streaming-tagged frame can't be collected outside the engine, so
    // pacing is asserted on the offset protocol itself)
    var last = 0L
    src.getBatch(None, LongOffset(0L)) // restart-style anchor: (0, 0] empty
    for (expect <- 1L to 4L) {
      val next = off(src.getOffset)
      assert(next == expect, s"offered $next after $last — cap ignored")
      src.getBatch(Some(LongOffset(last)), LongOffset(next))
      last = next
    }
    // fully drained: the next offer is the current version, no further step
    assert(off(src.getOffset) == 4L)
  }

  test("compareCols scopes the feed; untracked-column churn is invisible") {
    val root = Files.createTempDirectory("graft_lstream").toString
    val dir = root + "/t"
    DataLayout.writeZOrdered(
      (1L to 20L).map(i => (i, i, s"p$i")).toDF("k", "amt", "note"),
      dims, 16, Seq("k"), dir, 2)
    val feed = spark.readStream.format("graft-changefeed")
      .option("path", dir).option("keyCols", "k")
      .option("compareCols", "amt").load()
    assert(feed.columns.toSeq == Seq("sign", "k", "amt", "version"))
    val q = feed.writeStream.format("memory").queryName("lfeed4")
      .outputMode("append").start()
    try {
      // a merge that rewrites rows changing ONLY the untracked column
      DataLayout.mergeInto(spark, dir, dims, 16, Seq("k"),
        Seq((1L, 1L, "CHANGED")).toDF("k", "amt", "note"), Seq("k"), 1)
      q.processAllAvailable()
      assert(spark.table("lfeed4").isEmpty)
      // one that changes the tracked column streams both signs
      DataLayout.mergeInto(spark, dir, dims, 16, Seq("k"),
        Seq((2L, 999L, "p2")).toDF("k", "amt", "note"), Seq("k"), 1)
      q.processAllAvailable()
      assert(spark.table("lfeed4").select("sign", "k", "amt")
        .as[(String, Long, Long)].collect().toSet ==
        Set(("-", 2L, 2L), ("+", 2L, 999L)))
    } finally q.stop()
  }
}
