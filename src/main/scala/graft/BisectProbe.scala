package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.layout.DataLayout

/** Recursion-depth probe for the bisected cross-layout diff: two
  * differently-clustered copies of `orders` (so no file fingerprint
  * cancels), one localized key-range mutation, then `diffLayouts` at a
  * ladder of `bisectRowThreshold`s — the wall time and the reported
  * (levels, dirty segments, row-diffed files) show what each extra level
  * buys. At 100 TB the default 64k-row threshold forces the depth this
  * probe forces artificially at small sf; the point on record is that
  * each level costs one envelope-pruned checksum pass and buys a
  * JoinDiff bounded by the threshold, not by table/256.
  *
  * Run: `sbt "runMain graft.BisectProbe [sfDir]"` (default the sf0.1
  * fixture; point at a ScaleData output for 10x). Results in
  * PERFORMANCE.md.
  */
object BisectProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = java.nio.file.Files.createTempDirectory("graft_bisect").toString
    val orders = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    DataLayout.writeZOrdered(orders,
      Seq(col("o_custkey"), (col("o_totalprice") * 100).cast("long")), 20,
      Seq("o_orderstatus", "o_orderkey", "o_custkey"), s"$root/a", 16)
    DataLayout.writeZOrdered(orders, Seq(col("o_orderkey")), 20,
      Seq("o_orderstatus", "o_orderkey"), s"$root/b", 16)
    DataLayout.deleteWhere(spark, s"$root/b", Seq(col("o_orderkey")), 20,
      Seq("o_orderstatus", "o_orderkey"), Seq(("o_orderkey", 1000L, 2000L)))

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    for (thr <- Seq(Long.MaxValue, 1L << 16, 4096L, 256L)) {
      val ((r, rows), t) = time {
        val d = DataLayout.diffLayouts(spark, s"$root/a", s"$root/b",
          Seq("o_orderstatus", "o_orderkey"), Seq("o_custkey", "o_totalprice"),
          bisectRowThreshold = thr)
        (d, d.df.count())
      }
      println(f"[bisect] threshold=$thr%10d levels=${r.bisectLevels} " +
        f"dirtySegs=${r.segmentsDirty}%4d rowDiffFiles=${r.filesRowDiffedA}+" +
        f"${r.filesRowDiffedB} t=$t%6.2fs rows=$rows")
    }
    spark.stop()
  }
}
