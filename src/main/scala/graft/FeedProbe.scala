package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.layout.DataLayout

/** Change-feed CATCH-UP probe: the shape a lagging consumer (a replica
  * sync after a weekend, a restarted stream) actually pays. A layout takes
  * `versions` small appends plus a few rewrite/DV steps; the probe then
  * times `changeFeed(0, versions)` — planning (DataFrame construction,
  * where the per-step spelling paid two manifest jobs per version) and
  * execution (wall time to drain) separately — at two backlog lengths, so
  * the ratio exposes any superlinear planning term.
  *
  * Expected shape after the batched planner: planning ~O(1 manifest pass),
  * execution ∝ total churn (rows appended), ratio(2x backlog) ≈ 2× on
  * execution and ≈ 1–1.5× on planning.
  *
  * Run: `sbt "runMain graft.FeedProbe [versions] [rowsPerAppend]"`.
  * Results recorded in PERFORMANCE.md.
  */
object FeedProbe {
  def main(args: Array[String]): Unit = {
    val versions = if (args.nonEmpty) args(0).toInt else 100
    val rowsPer = if (args.length > 1) args(1).toLong else 20000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def build(nVersions: Int): String = {
      val dir = Files.createTempDirectory("graft_feed").toString + "/t"
      val dims = Seq(col("k"))
      def mk(lo: Long, n: Long) = spark.range(lo, lo + n)
        .select(col("id").as("k"), (col("id") * 13 % 65536).as("amt"))
      DataLayout.writeZOrdered(mk(0, rowsPer), dims, 24, Seq("k"), dir, 2)
      for (v <- 1 until nVersions) {
        DataLayout.appendZOrdered(mk(v.toLong * rowsPer, rowsPer), dims, 24,
          Seq("k"), dir, 1)
        // every 25th version is a rewrite step (real catch-ups hit a few)
        if (v % 25 == 0)
          DataLayout.compactZOrdered(spark, dir, dims, 24, Seq("k"),
            rowsPerFile = rowsPer * 30)
      }
      dir
    }

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // a DV-HEAVY history (nightly soft deletes): r18's batched DV-run
    // planner must keep planning O(runs), where the per-step spelling
    // planned one JoinDiff per night
    def buildDv(nSteps: Int): String = {
      val dir = Files.createTempDirectory("graft_feed_dv").toString + "/t"
      val dims = Seq(col("k"))
      def mk(lo: Long, n: Long) = spark.range(lo, lo + n)
        .select(col("id").as("k"), (col("id") * 13 % 65536).as("amt"))
      DataLayout.writeZOrdered(mk(0, rowsPer * 10), dims, 24, Seq("k"), dir, 8)
      for (v <- 0 until nSteps)
        DataLayout.deleteVectors(spark, dir,
          Seq(("k", v * 100L, v * 100L + 49L)))
      dir
    }

    def probe(tag: String, dir: String): Unit = {
      val cur = DataLayout.currentVersion(spark, dir)
      val (feed, tPlan) = time {
        DataLayout.changeFeed(spark, dir, 0L, cur, Seq("k"), Seq("amt"))
      }
      val ((rows, signs), tExec) = time {
        val c = feed.groupBy("sign").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        (c.values.sum, c.size)
      }
      println(f"[$tag] versions=$cur%3d plan=${tPlan}%6.2fs " +
        f"exec=${tExec}%6.2fs rows=$rows%9d signs=$signs")
    }

    for (n <- Seq(versions / 2, versions)) probe("feed", build(n))
    for (n <- Seq(versions / 2, versions)) probe("feed-dv", buildDv(n))
    spark.stop()
  }
}
