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
class HiveThriftSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {
  lazy val spark = SparkTest.spark

  private def thriftAvailable: Boolean =
    scala.util.Try(Class.forName(
      "org.apache.spark.sql.hive.thriftserver.HiveThriftServer2")).isSuccess &&
      scala.util.Try(Class.forName("org.apache.hive.jdbc.HiveDriver")).isSuccess

  // ONE server per JVM: HiveServer2's config is baked into the shared
  // session's hiveconf at first start, so a second startWithContext in the
  // same JVM silently keeps the old (stopped) port and every connection is
  // refused. The server is therefore owned by a JVM-wide singleton
  // (ThriftConformanceSpec.url — the conformance kit shares the same
  // socket) and deliberately never stopped mid-run.
  private def thriftUrl: String = ThriftConformanceSpec.url(spark)
  override def afterAll(): Unit = ()

  test("pushdown diff end to end over a live HiveServer2 Thrift socket") {
    assume(thriftAvailable, "no thrift server / hive-jdbc on the classpath")
    import spark.implicits._
    {
      // GLOBAL temp view: hive2 connections get their own Spark session,
      // and global_temp is the one catalog namespace they all share
      val bRows = (1L to 400L).filterNot(_ % 53 == 0)
        .map(i => (i, if (i % 29 == 0) s"S$i!" else s"s$i", i + 0.5))
      bRows.toDF("k", "s", "d").createOrReplaceGlobalTempView("pd_hive_b")
      val a = (1L to 400L).map(i => (i, s"s$i", i + 0.5)).toDF("k", "s", "d")

      val props = new java.util.Properties()
      props.setProperty("user", "anonymous")
      val url = thriftUrl
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
            s"remote:$url#global_temp.pd_hive_b",
            "-k", "k", "--json")), spark)
        }
        val lines = cliOut.toString("UTF-8").linesIterator.filter(_.startsWith("{")).size
        assert(lines == want.size, s"CLI over hive2 socket printed $lines of ${want.size}")
      } finally {
        eng.close()
        spark.catalog.dropGlobalTempView("pd_hive_b")
      }
    }
  }

  private def derbyAvailable: Boolean =
    scala.util.Try(Class.forName("org.apache.derby.jdbc.EmbeddedDriver")).isSuccess

  test("remote-remote across two live socket transports: Thrift side A, Derby side B") {
    // The strongest cross-engine claim this sandbox can host: NEITHER side
    // is Spark-readable — side A answers Spark SQL over a real HiveServer2
    // Thrift TCP socket, side B answers Derby SQL over the embedded JDBC
    // driver; two genuinely different wire protocols AND dialect families,
    // Spark only coordinating. Exercises the two hard control-loop paths
    // over the socket pair: (1) the dense-diff cutover (including its
    // sampled-children density confirmation), (2) hex-projection
    // segmentation against a TERRITORY_BASED (UCA-ordered, incomparable
    // with binary) Derby collation.
    assume(thriftAvailable, "no thrift server / hive-jdbc on the classpath")
    assume(derbyAvailable, "no Derby driver on the classpath")
    import spark.implicits._
    val denseDb = s"memory:graftsockdense${System.nanoTime()}"
    val terrDb = s"memory:graftsockterr${System.nanoTime()}"
    try {
      // ---- fixtures --------------------------------------------------------
      val nDense = 2048
      val denseA = (1L to nDense.toLong).map(i => (i, s"v$i"))
      denseA.toDF("k", "v").createOrReplaceGlobalTempView("rr_sock_dense_a")
      val denseB = denseA.map { case (k, v) => if (k % 2 == 0) (k, v + "X") else (k, v) }
      def seedDerby(db: String, create: String, ddl: String,
          rows: Seq[String]): Unit = {
        val c = java.sql.DriverManager.getConnection(create)
        try {
          def exec(sql: String): Unit = {
            val st = c.createStatement()
            try st.executeUpdate(sql) finally st.close()
          }
          DerbyProfile.bootstrapSql.foreach(exec)
          exec(ddl)
          rows.grouped(500).foreach(g => exec(
            s"INSERT INTO ${ddl.split(' ')(2)} VALUES " + g.mkString(", ")))
        } finally c.close()
      }
      seedDerby(denseDb, s"jdbc:derby:$denseDb;create=true",
        """CREATE TABLE sockdense ("k" BIGINT, "v" VARCHAR(30))""",
        denseB.map { case (k, v) => s"($k, '$v')" })
      def keyOf(i: Int) = f"k-$i%03d_${if (i % 2 == 0) "A" else "z"}"
      val nTerr = 400
      val terrA = (1 to nTerr).map(i => (keyOf(i), s"v$i"))
      terrA.toDF("k", "v").createOrReplaceGlobalTempView("rr_sock_terr_a")
      val terrB = (1 to nTerr).filterNot(_ == 77)
        .map(i => (keyOf(i), if (i <= 40) s"v$i!" else s"v$i")) :+ ("k-999_X", "only-b")
      seedDerby(terrDb,
        s"jdbc:derby:$terrDb;create=true;territory=en_US;collation=TERRITORY_BASED",
        """CREATE TABLE sockterr ("k" VARCHAR(20), "v" VARCHAR(30))""",
        terrB.map { case (k, v) => s"('$k', '$v')" })

      val props = new java.util.Properties()
      props.setProperty("user", "anonymous")
      val thrift = new JdbcEngine(thriftUrl, props, SparkProfile)
      val derbyDense = new JdbcEngine(s"jdbc:derby:$denseDb", new java.util.Properties(), DerbyProfile)
      val derbyTerr = new JdbcEngine(s"jdbc:derby:$terrDb", new java.util.Properties(), DerbyProfile)
      try {
        def norm(df: org.apache.spark.sql.DataFrame) = {
          val cols = graft.diff.Normalize.normalizedCols(df.schema, Seq("k", "v"))
          df.select(Seq("k", "v").zip(cols).map { case (n, c) => c.as(n) }: _*)
        }

        // ---- (1) dense cutover over the socket pair ------------------------
        val sideA = RemoteTable.introspect(thrift, "global_temp.rr_sock_dense_a",
          Seq("k"), Seq("v"))
        val sideB = RemoteTable.introspect(derbyDense, "sockdense", Seq("k"), Seq("v"))
        val (outDense, statsDense) = RemoteRemoteDiffer.diff(spark, sideA, sideB,
          bisectionFactor = 4, bisectionThreshold = 64)
        assert(statsDense.denseCutoverAtLevel.nonEmpty,
          s"50%-different sides must cut over: $statsDense")
        val wantDense = graft.diff.JoinDiffer.diff(
          norm(denseA.toDF("k", "v")), norm(denseB.toDF("k", "v")), Seq("k"), Seq("v"))
          .collect().map(_.mkString("|")).toSet
        assert(wantDense.size == nDense &&
          outDense.collect().map(_.mkString("|")).toSet == wantDense)

        // ---- (2) hex projection over the socket pair -----------------------
        val territory = Collation(ordinal = Some(false), language = Some("en"),
          country = Some("US"), caseSensitive = Some(true), accentSensitive = Some(true))
        val terrSideA = RemoteTable.introspect(thrift, "global_temp.rr_sock_terr_a",
          Seq("k"), Seq("v"))
        val terrSideB = RemoteTable.introspect(derbyTerr, "sockterr", Seq("k"), Seq("v"),
          keyCollation = territory)
        val (outTerr, statsTerr) = RemoteRemoteDiffer.diff(spark, terrSideA, terrSideB,
          bisectionFactor = 4, bisectionThreshold = 32)
        assert(statsTerr.segmentsPruned > 0, s"$statsTerr")
        val wantTerr = graft.diff.JoinDiffer.diff(
          terrA.toDF("k", "v"), terrB.toDF("k", "v"), Seq("k"), Seq("v"))
          .collect().map(_.mkString("|")).toSet
        assert(wantTerr.size == 82, s"${wantTerr.size}")
        assert(outTerr.collect().map(_.mkString("|")).toSet == wantTerr)
        assert(statsTerr.rowsFetched < nTerr, s"must not ship the whole table: $statsTerr")
      } finally {
        thrift.close(); derbyDense.close(); derbyTerr.close()
      }
    } finally {
      spark.catalog.dropGlobalTempView("rr_sock_dense_a")
      spark.catalog.dropGlobalTempView("rr_sock_terr_a")
      Seq(denseDb, terrDb).foreach(db =>
        scala.util.Try(java.sql.DriverManager.getConnection(s"jdbc:derby:$db;drop=true")))
    }
  }
}
