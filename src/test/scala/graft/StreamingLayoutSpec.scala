package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.layout.DataLayout
import graft.streaming.StreamingDiff

class StreamingLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def batchDf(base: Long, n: Int) = {
    val rnd = new scala.util.Random(base)
    (0 until n).map(i => (base + i, rnd.nextLong(1 << 16), rnd.nextLong(1 << 16)))
      .toDF("id", "x", "y")
  }

  test("streaming clustered ingest: appends land z-ordered, compaction keeps files bounded") {
    val dir = Files.createTempDirectory("graft_slayout").toString + "/t"
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long)]
    val q = StreamingDiff.clusteredIngestSink(
      input.toDF().toDF("id", "x", "y"),
      Seq(col("x"), col("y")), bits = 16, statsCols = Seq("x", "y"),
      dir = dir, filesPerBatch = 2, compactEvery = 2, rowsPerFile = 600L)
      .start()
    try {
      for (b <- 0 until 5) {
        input.addData((0 until 400).map(i =>
          (b * 1000L + i, (b * 7919L + i * 13L) % 65536L, (b * 104729L + i * 31L) % 65536L)))
        q.processAllAvailable()
      }
    } finally q.stop()
    val all = DataLayout.readLayout(spark, dir)
    assert(all.count() == 2000L)
    // skip-scan answers exactly like a plain filter over everything ingested
    val want = all.where(col("x") <= 20000L && col("y") <= 20000L)
      .select("id").as[Long].collect().sorted.toSeq
    val scan = DataLayout.skipScan(spark, dir,
      Seq(("x", 0L, 20000L), ("y", 0L, 20000L)))
    assert(scan.df.select("id").as[Long].collect().sorted.toSeq == want)
    // compaction ran: without it 5 batches × 2 files stay 10 overlapping
    // files; after the batch-4 compact the manifest count matches disk and
    // is bounded by ceil(2000/600)+appends
    assert(scan.filesTotal <= 8, s"filesTotal=${scan.filesTotal}")
    val manifest = DataLayout.aliveManifest(spark, dir)
    assert(manifest.count().toInt == scan.filesTotal)
  }

  test("streaming CDC merge: upserts, tombstones, last-event-wins, replay safety") {
    val dir = Files.createTempDirectory("graft_slayout").toString + "/t"
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String, Long)]
    val q = StreamingDiff.cdcMergeSink(
      input.toDF().toDF("id", "payload", "op", "seq"),
      Seq(col("id")), bits = 16, statsCols = Seq("id"), dir = dir,
      keyCols = Seq("id"), opCol = "op", seqCol = "seq", numFiles = 4)
      .start()
    try {
      // batch 0: 500 inserts bootstrap the layout
      input.addData((0 until 500).map(i => (i.toLong, s"v$i", "I", 1L)))
      q.processAllAvailable()
      // batch 1: updates, deletes, and two keys with MULTIPLE events whose
      // seq order decides the winner (42: update then delete -> gone;
      // 43: delete then update -> alive with the new payload)
      input.addData(
        (100 until 110).map(i => (i.toLong, s"UPD$i", "U", 2L)) ++
        (200 until 210).map(i => (i.toLong, "", "D", 2L)) ++
        Seq((42L, "UPD42", "U", 2L), (42L, "", "D", 3L),
            (43L, "", "D", 2L), (43L, "LATE43", "U", 3L),
            (9000L, "NEW9000", "I", 2L)))
      q.processAllAvailable()
    } finally q.stop()
    val got = DataLayout.readLayout(spark, dir)
      .select("id", "payload").as[(Long, String)].collect().toMap
    assert(got.size == 500 - 10 - 1 + 1) // -deletes -42 +9000
    assert(got(105L) == "UPD105" && got(9000L) == "NEW9000")
    assert(!got.contains(205L) && !got.contains(42L))
    assert(got(43L) == "LATE43" && got(77L) == "v77")
    // replayed batch id: marker makes it a no-op even with new content
    val vBefore = DataLayout.currentVersion(spark, dir)
    StreamingDiff.cdcMergeBatch(
      Seq((77L, "SHOULD_NOT_LAND", "U", 9L)).toDF("id", "payload", "op", "seq"),
      1L, Seq(col("id")), 16, Seq("id"), dir, Seq("id"), "op", "seq", 4)
    assert(DataLayout.currentVersion(spark, dir) == vBefore)
    assert(DataLayout.readLayout(spark, dir).where(col("id") === 77L)
      .select("payload").head().getString(0) == "v77")
  }

  test("replayed micro-batch ids are no-ops (at-least-once -> exactly-once)") {
    val dir = Files.createTempDirectory("graft_slayout").toString + "/t"
    val dims = Seq(col("x"), col("y"))
    def ingest(id: Long, base: Long): Unit =
      StreamingDiff.ingestBatch(batchDf(base, 300), id, dims, 16,
        Seq("x", "y"), dir, filesPerBatch = 2, compactEvery = 0, rowsPerFile = 1000L)
    ingest(0L, 0L)
    ingest(1L, 10000L)
    assert(DataLayout.readLayout(spark, dir).count() == 600L)
    // replay both ids — nothing may change
    ingest(0L, 0L)
    ingest(1L, 10000L)
    assert(DataLayout.readLayout(spark, dir).count() == 600L)
    // a NEW id appends
    ingest(2L, 20000L)
    assert(DataLayout.readLayout(spark, dir).count() == 900L)
    // manifest stayed consistent throughout
    val m = DataLayout.aliveManifest(spark, dir)
    assert(m.agg(sum("n_rows")).head().getLong(0) == 900L)
  }

  test("crash between manifest commit and commit marker does not duplicate") {
    val dir = Files.createTempDirectory("graft_slayout").toString + "/t"
    val dims = Seq(col("x"), col("y"))
    def ingest(id: Long, base: Long): Unit =
      StreamingDiff.ingestBatch(batchDf(base, 300), id, dims, 16,
        Seq("x", "y"), dir, filesPerBatch = 2, compactEvery = 2, rowsPerFile = 1000L)
    ingest(0L, 0L)
    ingest(1L, 10000L)
    assert(DataLayout.readLayout(spark, dir).count() == 600L)
    // simulate batch 2 crashing AFTER its append committed the manifest
    // but BEFORE the commit marker: write the intent, do the append, stop
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val ver = DataLayout.currentVersion(spark, dir)
    val intent = new org.apache.hadoop.fs.Path(dir, "_graft_stream_intent")
    val out = fs.create(intent, true)
    out.write(s"2:$ver".getBytes("UTF-8")); out.close()
    DataLayout.appendZOrdered(batchDf(20000L, 300), dims, 16, Seq("x", "y"),
      dir, numFiles = 2)
    assert(DataLayout.readLayout(spark, dir).count() == 900L)
    // the retry of batch 2 must NOT re-append those 300 rows
    ingest(2L, 20000L)
    assert(DataLayout.readLayout(spark, dir).count() == 900L)
    // and the pipeline continues normally afterwards
    ingest(3L, 30000L)
    assert(DataLayout.readLayout(spark, dir).count() == 1200L)
    // simulate a crash BEFORE the manifest commit for batch 4: intent
    // written, nothing else — the retry must do the real append exactly once
    val out2 = fs.create(intent, true)
    out2.write(s"4:${DataLayout.currentVersion(spark, dir)}".getBytes("UTF-8"))
    out2.close()
    ingest(4L, 40000L)
    assert(DataLayout.readLayout(spark, dir).count() == 1500L)
  }
}
