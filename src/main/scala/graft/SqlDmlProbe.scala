package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-statement timing decomposition of the `q_layout_sql_dml` gate —
  * isolates the general conditional-arm MERGE (the r18 cost finding)
  * from the write/insert/delete/canonical-merge statements around it.
  * Run: `runMain graft.SqlDmlProbe [sfDir]`. */
object SqlDmlProbe {
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
      println(f"[dmlprobe] $label%-16s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val orders = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    orders.count()
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "4").toInt
    for (rep <- 1 to reps) {
      println(s"[dmlprobe] rep $rep")
      val dir = java.nio.file.Files.createTempDirectory("dmlprobe").toString +
        "/t"
      val mod = pmod(col("o_orderkey"), lit(4))
      t("write")(orders.where(mod < 3).write.format("graft")
        .mode("overwrite")
        .option("dims", "o_custkey").option("bits", "24")
        .option("statsCols", "o_custkey,o_orderkey,o_totalprice")
        .option("numFiles", "12").save(dir))
      spark.sql("DROP VIEW IF EXISTS dmlprobe_v")
      spark.sql(
        s"CREATE TEMPORARY VIEW dmlprobe_v USING graft OPTIONS (path '$dir')")
      orders.where(mod === 3).createOrReplaceTempView("dmlprobe_delta")
      t("insert")(spark.sql(
        "INSERT INTO dmlprobe_v SELECT * FROM dmlprobe_delta"))
      t("delete")(graft.layout.GraftSql(spark,
        "DELETE FROM dmlprobe_v WHERE o_custkey BETWEEN 300 AND 400"))
      orders.where(col("o_orderkey").between(100, 2000))
        .withColumn("o_orderstatus", lit("M"))
        .createOrReplaceTempView("dmlprobe_src")
      t("merge_canon")(graft.layout.GraftSql(spark,
        """MERGE INTO dmlprobe_v USING dmlprobe_src src
          |ON dmlprobe_v.o_orderkey = src.o_orderkey
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
      t("update")(graft.layout.GraftSql(spark,
        "UPDATE dmlprobe_v SET o_orderstatus = 'U' " +
          "WHERE o_custkey BETWEEN 10 AND 20"))
      orders.where(col("o_orderkey").between(2100, 2400))
        .select(col("o_orderkey"),
          when(col("o_orderkey") <= 2200, lit("D")).otherwise(lit("U"))
            .as("op"))
        .createOrReplaceTempView("dmlprobe_cdc")
      t("merge_general")(graft.layout.GraftSql(spark,
        """MERGE INTO dmlprobe_v t USING dmlprobe_cdc c
          |ON t.o_orderkey = c.o_orderkey
          |WHEN MATCHED AND c.op = 'D' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET o_orderstatus = 'C'""".stripMargin))
      t("readback")(spark.sql(
        """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
          |FROM dmlprobe_v ORDER BY o_orderkey""".stripMargin)
        .write.format("noop").mode("overwrite").save())
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir).getParentFile)
    }
    spark.stop()
  }
}
