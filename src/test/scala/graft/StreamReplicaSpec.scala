package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.layout.DataLayout
import graft.streaming.StreamingDiff

/** The composition the two streaming halves exist for: `readStream` over
  * one layout's change feed, `cdcMergeSink` into another — a CONTINUOUS
  * REPLICA built entirely from the public streaming API, no bespoke
  * orchestration. Each trigger ships one version step's churn.
  */
class StreamReplicaSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("readStream(changefeed) |> cdcMergeSink = a replica that tracks every mutation") {
    val root = Files.createTempDirectory("graft_streprep").toString
    val src = root + "/src"
    val dst = root + "/dst"
    val dims = Seq(col("k"))

    DataLayout.writeZOrdered((1L to 400L).map(i => (i, i * 3)).toDF("k", "amt"),
      dims, 16, Seq("k"), src, 4)                                 // v0

    val feed = spark.readStream.format("graft-changefeed")
      .option("path", src).option("keyCols", "k")
      .option("startingVersion", "-1") // bootstrap: snapshot streams as '+'
      .load()
    // change-feed rows -> CDC events: '+' upserts, '-' deletes. An update
    // emits both signs AT THE SAME version, so the last-event-wins seq
    // must rank '+' above '-' within a version: seq = 2*version + is_plus.
    val cdc = feed.select(
      col("k"), col("amt"),
      when(col("sign") === "+", lit("U")).otherwise(lit("D")).as("op"),
      (col("version") * 2 + when(col("sign") === "+", 1L).otherwise(0L)).as("seq"))
    val q = StreamingDiff.cdcMergeSink(cdc, Seq(col("k")), bits = 16,
      statsCols = Seq("k"), dir = dst, keyCols = Seq("k"),
      opCol = "op", seqCol = "seq", numFiles = 2)
      .option("checkpointLocation", root + "/ck")
      .start()

    def srcRows() = DataLayout.readLayout(spark, src)
      .select("k", "amt").as[(Long, Long)].collect().toMap
    def dstRows() = DataLayout.readLayout(spark, dst)
      .select("k", "amt").as[(Long, Long)].collect().toMap
    try {
      q.processAllAvailable()
      assert(dstRows() == srcRows()) // bootstrap snapshot replicated

      // churn: an append, an update-heavy merge, a DV delete
      DataLayout.appendZOrdered(
        (500L to 520L).map(i => (i, i)).toDF("k", "amt"),
        dims, 16, Seq("k"), src, 1)                               // v1
      DataLayout.mergeInto(spark, src, dims, 16, Seq("k"),
        (1L to 30L).map(i => (i, -i)).toDF("k", "amt"), Seq("k"), 1) // v2
      DataLayout.deleteVectors(spark, src, Seq(("k", 100L, 140L)))   // v3
      q.processAllAvailable()
      val (s3, d3) = (srcRows(), dstRows())
      assert(d3 == s3)
      assert(s3(5L) == -5L && !s3.contains(120L) && s3(510L) == 510L)
    } finally q.stop()

    // restart: replication resumes from the checkpoint without replaying
    DataLayout.deleteVectors(spark, src, Seq(("k", 200L, 210L)))     // v4
    val q2 = StreamingDiff.cdcMergeSink(cdc, Seq(col("k")), 16, Seq("k"),
      dst, Seq("k"), "op", "seq", 2)
      .option("checkpointLocation", root + "/ck").start()
    try {
      q2.processAllAvailable()
      assert(dstRows() == srcRows())
      assert(!dstRows().contains(205L))
    } finally q2.stop()
  }
}
