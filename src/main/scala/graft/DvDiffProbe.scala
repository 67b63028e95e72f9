package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.layout.DataLayout

/** Phase-timing probe for the `q_layout_dv_diff` gate — decomposes the
  * write / delete / diff / consume wall time so a per-call fixed-cost
  * regression in [[DataLayout.diffVersions]] (the r18 repin finding) can
  * be attributed to a specific job instead of eyeballed from suite
  * minima. Run: `runMain graft.DvDiffProbe [sfDir]`. */
object DvDiffProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dvdprobe] $label%-14s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val cents = (round(col("o_totalprice") * 100)).cast("long")
    val orders = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    orders.count() // warm the table outside the timed phases
    for (rep <- 1 to sys.env.getOrElse("SPARK_GRAFT_REPEATS", "4").toInt) {
      val dir = java.nio.file.Files.createTempDirectory("dvdprobe").toString
      println(s"[dvdprobe] rep $rep")
      t("write")(DataLayout.writeZOrdered(orders,
        Seq(col("o_custkey"), cents), 24,
        Seq("o_custkey", "o_totalprice"), dir, numFiles = 16))
      t("delete")(DataLayout.deleteVectors(spark, dir,
        Seq(("o_custkey", 100L, 220L))))
      val vd = t("plan")(DataLayout.diffVersions(spark, dir, 0L, 1L,
        Seq("o_orderkey"), Seq("o_custkey", "o_totalprice")))
      t("consume")(vd.df.orderBy("o_orderkey")
        .write.format("noop").mode("overwrite").save())
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
    spark.stop()
  }
}
