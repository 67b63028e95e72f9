package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources._

/** A REAL network-socket wire test for the warehouse protocol family the
  * sandbox CAN host: Spark ships its own HiveServer2-compatible Thrift
  * endpoint (`spark-hive-thriftserver`) plus the Hive JDBC driver, so the
  * full pushdown control loop runs against `jdbc:hive2://localhost:<port>`
  * over an actual TCP socket — the same protocol a Spark Thrift Server,
  * HiveServer2, or Databricks SQL endpoint speaks in production. This is
  * the socket-transport evidence the embedded-Derby tests cannot give
  * (the container's Derby distribution has no network server), with the
  * remote's SQL dialect being Spark SQL itself ([[SparkProfile]]). */
class HiveThriftSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  private def thriftAvailable: Boolean =
    scala.util.Try(Class.forName(
      "org.apache.spark.sql.hive.thriftserver.HiveThriftServer2")).isSuccess &&
      scala.util.Try(Class.forName("org.apache.hive.jdbc.HiveDriver")).isSuccess

  test("pushdown diff end to end over a live HiveServer2 Thrift socket") {
    assume(thriftAvailable, "no thrift server / hive-jdbc on the classpath")
    import spark.implicits._
    val port = {
      val ss = new java.net.ServerSocket(0)
      try ss.getLocalPort finally ss.close()
    }
    spark.conf.set("hive.server2.thrift.port", port.toString)
    spark.conf.set("hive.server2.thrift.bind.host", "localhost")
    val server = org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
      .startWithContext(spark.sqlContext)
    try {
      // GLOBAL temp view: hive2 connections get their own Spark session,
      // and global_temp is the one catalog namespace they all share
      val bRows = (1L to 400L).filterNot(_ % 53 == 0)
        .map(i => (i, if (i % 29 == 0) s"S$i!" else s"s$i", i + 0.5))
      bRows.toDF("k", "s", "d").createOrReplaceGlobalTempView("pd_hive_b")
      val a = (1L to 400L).map(i => (i, s"s$i", i + 0.5)).toDF("k", "s", "d")

      // the server binds asynchronously — poll the socket until it accepts
      val props = new java.util.Properties()
      props.setProperty("user", "anonymous")
      val url = s"jdbc:hive2://localhost:$port/default"
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var up = false
      while (!up) {
        try { java.sql.DriverManager.getConnection(url, props).close(); up = true }
        catch {
          case e: Exception =>
            if (System.nanoTime() > deadline) throw e
            Thread.sleep(500)
        }
      }

      val eng = new JdbcEngine(url, props, SparkProfile)
      try {
        // introspected production path: schema comes over the socket via
        // DESCRIBE TABLE, checksums run remotely, only leaf rows cross
        val out = graft.api.Graft.diffPushdownIntrospected(
          graft.diff.TableSegment(a, Seq("k")), eng, "global_temp.pd_hive_b",
          bisectionFactor = 4, bisectionThreshold = 64)
        def norm(df: org.apache.spark.sql.DataFrame) = {
          val cols = graft.diff.Normalize.normalizedCols(df.schema, Seq("k", "s", "d"))
          df.select(Seq("k", "s", "d").zip(cols).map { case (n, c) => c.as(n) }: _*)
        }
        val want = graft.diff.JoinDiffer.diff(
          norm(a), norm(bRows.toDF("k", "s", "d")), Seq("k"), Seq("s", "d"))
          .collect().map(_.mkString("|")).toSet
        assert(want.nonEmpty, "fixture produced no diff — test is vacuous")
        assert(out.collect().map(_.mkString("|")).toSet == want)

        // the CLI's remote:jdbc route must resolve the hive2 subprotocol
        // to the Spark dialect and produce the same diff over the socket
        val dir = java.nio.file.Files.createTempDirectory("clihive").toString
        a.write.parquet(s"$dir/local")
        val cliOut = new java.io.ByteArrayOutputStream
        Console.withOut(new java.io.PrintStream(cliOut, true, "UTF-8")) {
          graft.cli.Cli.run(graft.cli.Cli.parseArgs(Array(s"$dir/local",
            s"remote:jdbc:hive2://localhost:$port/default#global_temp.pd_hive_b",
            "-k", "k", "--json")), spark)
        }
        val lines = cliOut.toString("UTF-8").linesIterator.filter(_.startsWith("{")).size
        assert(lines == want.size, s"CLI over hive2 socket printed $lines of ${want.size}")
      } finally eng.close()
    } finally {
      server.stop()
      spark.catalog.dropGlobalTempView("pd_hive_b")
    }
  }
}
