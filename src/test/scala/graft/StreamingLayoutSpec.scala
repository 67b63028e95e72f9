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

  test("a marker truncated by a crash mid-write reads as absent, not a wedge") {
    val dir = Files.createTempDirectory("graft_slayout").toString + "/t"
    val dims = Seq(col("x"), col("y"))
    def ingest(id: Long, base: Long): Unit =
      StreamingDiff.ingestBatch(batchDf(base, 300), id, dims, 16,
        Seq("x", "y"), dir, filesPerBatch = 2, compactEvery = 0, rowsPerFile = 1000L)
    ingest(0L, 0L)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    // crash DURING the commit-marker write of batch 1: append + manifest
    // committed, intent still present, commit marker left ZERO-BYTE
    val ver0 = DataLayout.currentVersion(spark, dir)
    val intent = new org.apache.hadoop.fs.Path(dir, "_graft_stream_intent")
    val o = fs.create(intent, true)
    o.write(s"1:$ver0".getBytes("UTF-8")); o.close()
    DataLayout.appendZOrdered(batchDf(10000L, 300), dims, 16, Seq("x", "y"),
      dir, numFiles = 2)
    val commit = new org.apache.hadoop.fs.Path(dir, "_graft_stream_commit")
    fs.create(commit, true).close() // zero-byte residue
    // the retry must neither throw NumberFormatException forever nor
    // re-append: intent says batch 1's manifest already committed
    ingest(1L, 10000L)
    assert(DataLayout.readLayout(spark, dir).count() == 600L)
    ingest(2L, 20000L)
    assert(DataLayout.readLayout(spark, dir).count() == 900L)
    // same for the CDC sink's marker: zero-byte marker, replayed batch —
    // mergeInto is idempotent, so the re-apply converges with no dupes
    val cdcDir = Files.createTempDirectory("graft_slayout").toString + "/c"
    def cdc(id: Long, rows: Seq[(Long, String, String, Long)]): Unit =
      StreamingDiff.cdcMergeBatch(rows.toDF("id", "payload", "op", "seq"),
        id, Seq(col("id")), 16, Seq("id"), cdcDir, Seq("id"), "op", "seq", 2)
    cdc(0L, (0 until 100).map(i => (i.toLong, s"v$i", "I", 1L)))
    val cdcCommit = new org.apache.hadoop.fs.Path(cdcDir, "_graft_cdc_commit")
    fs.create(cdcCommit, true).close() // zero-byte residue
    cdc(0L, (0 until 100).map(i => (i.toLong, s"v$i", "I", 1L))) // replay
    assert(DataLayout.readLayout(spark, cdcDir).count() == 100L)
  }

  test("streaming IVM: the view tracks a CDC-fed layout exactly, per trigger") {
    val root = Files.createTempDirectory("graft_sivm").toString
    val dir = root + "/t"
    val viewDir = root + "/v"
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // (id, grp, amount_cents, op, seq) — whole-cent longs so the
    // incremental view must equal a full recompute EXACTLY
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long, String, Long)]
    val q = StreamingDiff.ivmSink(
      input.toDF().toDF("id", "grp", "amount", "op", "seq"),
      Seq(col("id")), bits = 16, statsCols = Seq("id"), dir = dir,
      keyCols = Seq("id"), opCol = "op", seqCol = "seq", viewDir = viewDir,
      groupCols = Seq("grp"), measures = Seq("amount"), numFiles = 2)
      .start()
    def viewRows() = graft.layout.MatView.read(spark, viewDir)
      .select("grp", "n_rows", "sum_amount", "min_amount", "max_amount")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    def recompute() = DataLayout.readLayout(spark, dir)
      .groupBy("grp").agg(count(lit(1)), sum("amount"), min("amount"), max("amount"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    try {
      // trigger 0 bootstraps layout + view in one full (batch-sized) pass
      input.addData((0 until 300).map(i =>
        (i.toLong, s"g${i % 7}", (i * 101L) % 9973L, "I", 1L)))
      q.processAllAvailable()
      assert(viewRows() == recompute())
      // trigger 1: updates move values BETWEEN groups, deletes clip a
      // group's maximum (the dirty-group path), and one new group appears
      input.addData(
        (0 until 40).map(i => (i.toLong, s"g${(i + 1) % 7}", 50000L + i, "U", 2L)) ++
        (250 until 300).map(i => (i.toLong, "", 0L, "D", 2L)) ++
        Seq((9001L, "gNEW", 7L, "I", 2L)))
      q.processAllAvailable()
      assert(viewRows() == recompute())
      // trigger 2: empty a whole group — it must LEAVE the view
      input.addData((0 until 300).collect {
        case i if (if (i < 40) (i + 1) % 7 else i % 7) == 3 && i < 250 =>
          (i.toLong, "", 0L, "D", 3L) })
      q.processAllAvailable()
      val v2 = viewRows()
      assert(v2 == recompute())
      assert(!v2.contains("g3"))
    } finally q.stop()
    // replayed trigger id: both halves no-op (marker + version-anchored)
    val vBefore = DataLayout.currentVersion(spark, dir)
    val viewBefore = viewRows()
    StreamingDiff.ivmBatch(
      Seq((0L, "gX", 1L, "U", 99L)).toDF("id", "grp", "amount", "op", "seq"),
      1L, Seq(col("id")), 16, Seq("id"), dir, Seq("id"), "op", "seq",
      viewDir, Seq("grp"), Seq("amount"), 2)
    assert(DataLayout.currentVersion(spark, dir) == vBefore)
    assert(viewRows() == viewBefore)
    // crash between merge and refresh: merge batch 3 directly (view now
    // stale), then a later trigger's refresh must roll across the gap
    StreamingDiff.cdcMergeBatch(
      Seq((1L, "gLATE", 123L, "U", 4L)).toDF("id", "grp", "amount", "op", "seq"),
      3L, Seq(col("id")), 16, Seq("id"), dir, Seq("id"), "op", "seq", 2)
    StreamingDiff.ivmBatch(
      Seq((2L, "gLATE", 456L, "U", 5L)).toDF("id", "grp", "amount", "op", "seq"),
      4L, Seq(col("id")), 16, Seq("id"), dir, Seq("id"), "op", "seq",
      viewDir, Seq("grp"), Seq("amount"), 2)
    assert(viewRows() == recompute())
    assert(viewRows()("gLATE") == ((2L, 579L, 123L, 456L)))
  }

  test("a CDC event with a NULL op upserts per contract, never vanishes") {
    val dir = Files.createTempDirectory("graft_slayout").toString + "/t"
    def cdc(id: Long, rows: Seq[(Long, String, String, Long)]): Unit =
      StreamingDiff.cdcMergeBatch(rows.toDF("id", "payload", "op", "seq"),
        id, Seq(col("id")), 16, Seq("id"), dir, Seq("id"), "op", "seq", 2)
    cdc(0L, (0 until 50).map(i => (i.toLong, s"v$i", "I", 1L)))
    // op = NULL is "any other value" per the scaladoc -> upsert
    cdc(1L, Seq((7L, "NULLOP7", null, 2L), (99L, "NEW99", null, 2L)))
    val got = DataLayout.readLayout(spark, dir)
      .select("id", "payload").as[(Long, String)].collect().toMap
    assert(got(7L) == "NULLOP7" && got(99L) == "NEW99" && got.size == 51)
  }
}
