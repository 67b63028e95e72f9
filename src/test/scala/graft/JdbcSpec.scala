package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{JdbcEngine, PostgresProfile}

/** Integration proof for the production JDBC bridge (RemoteEngine's real-
  * deployment path). Guarded on driver presence: Spark's unmanaged classpath
  * happens to ship embedded Derby (its Hive-metastore backend), which is a
  * complete JDBC driver — if a future environment drops it, the suite skips
  * cleanly instead of failing.
  */
class JdbcEngineSpec extends AnyFunSuite {

  private def derbyAvailable: Boolean =
    scala.util.Try(Class.forName("org.apache.derby.jdbc.EmbeddedDriver")).isSuccess

  test("connectToTable reads a jdbc: source and diffs it against parquet") {
    assume(derbyAvailable, "no JDBC driver on the classpath")
    val spark = SparkTest.spark
    import spark.implicits._
    val db = s"memory:graftread${System.nanoTime()}"
    val setup = java.sql.DriverManager.getConnection(s"jdbc:derby:$db;create=true")
    try {
      val st = setup.createStatement()
      st.executeUpdate("CREATE TABLE t2 (k BIGINT, v VARCHAR(20))")
      st.executeUpdate("INSERT INTO t2 VALUES (1, 'a'), (2, 'b'), (3, 'c')")
      st.close()
      val dir = java.nio.file.Files.createTempDirectory("jdbcread").toString
      Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v").write.parquet(s"$dir/p")
      val a = graft.api.Graft.connectToTable(spark, s"jdbc:derby:$db#t2", Seq("k"))
      val b = graft.api.Graft.connectToTable(spark, s"$dir/p", Seq("k"))
      val signs = graft.api.Graft.diffTables(a, b)
        .select("sign", "k").as[(String, Long)].collect().toSet
      assert(signs == Set(("-", 2L), ("+", 2L), ("-", 3L), ("+", 4L)))
    } finally setup.close()
  }

  test("JdbcEngine round-trips rows, NULLs, decimals, and errors through a real driver") {
    assume(derbyAvailable, "no JDBC driver on the classpath")
    val db = s"memory:graftjdbc${System.nanoTime()}"
    val setup = java.sql.DriverManager.getConnection(s"jdbc:derby:$db;create=true")
    try {
      val st = setup.createStatement()
      st.executeUpdate("CREATE TABLE t1 (id BIGINT, name VARCHAR(20), amt DECIMAL(10,2))")
      st.executeUpdate("INSERT INTO t1 VALUES (1, 'alice', 10.50), (2, NULL, NULL)")
      st.close()

      val eng = new JdbcEngine(s"jdbc:derby:$db", new java.util.Properties(), PostgresProfile)
      try {
        // the engine contract: every value text-rendered, NULL as None
        val rows = eng.query("SELECT id, name, amt FROM t1 ORDER BY id")
        assert(rows == Seq(
          Seq(Some("1"), Some("alice"), Some("10.50")),
          Seq(Some("2"), None, None)))
        // driver errors surface, not silently-empty results
        intercept[java.sql.SQLException](eng.query("SELECT nope FROM t1"))
        // statements are closed per query — the connection stays usable
        assert(eng.query("SELECT COUNT(*) FROM t1") == Seq(Seq(Some("2"))))
      } finally eng.close()
    } finally {
      setup.close()
      // in-memory Derby drops via a connection attempt that "fails" on success
      scala.util.Try(java.sql.DriverManager.getConnection(s"jdbc:derby:$db;drop=true"))
    }
  }

  test("live Derby pushdown end to end: introspection, batched checksums, leaf compare") {
    // the third live pushdown engine family, through the real JDBC bridge:
    // schema comes from Derby's SYS catalog, per-level checksums run the
    // Java-backed md5 bootstrap in Derby's own SQL (derived-table GROUP BY
    // — Derby refuses grouping by expressions), and only leaf rows cross.
    assume(derbyAvailable, "no JDBC driver on the classpath")
    val spark = SparkTest.spark
    import spark.implicits._
    import graft.sources.DerbyProfile
    val db = s"memory:graftpd${System.nanoTime()}"
    val setup = java.sql.DriverManager.getConnection(s"jdbc:derby:$db;create=true")
    try {
      def exec(sql: String): Unit = {
        val st = setup.createStatement()
        try st.executeUpdate(sql) finally st.close()
      }
      DerbyProfile.bootstrapSql.foreach(exec)
      exec("""CREATE TABLE pd ("k" BIGINT, "s" VARCHAR(30), "d" DOUBLE)""")
      val bRows = (1L to 600L).filterNot(_ % 83 == 0)
        .map(i => (i, if (i % 37 == 0) s"S$i!" else s"s$i", i + 0.25))
      exec("INSERT INTO pd VALUES " +
        bRows.map { case (k, s, d) => s"($k, '$s', ${d}E0)" }.mkString(", "))
      val a = (1L to 600L).map(i => (i, s"s$i", i + 0.25)).toDF("k", "s", "d")

      val eng = new JdbcEngine(s"jdbc:derby:$db", new java.util.Properties(), DerbyProfile)
      try {
        val out = graft.api.Graft.diffPushdownIntrospected(
          graft.diff.TableSegment(a, Seq("k")), eng, "pd",
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
      } finally eng.close()
    } finally {
      setup.close()
      scala.util.Try(java.sql.DriverManager.getConnection(s"jdbc:derby:$db;drop=true"))
    }
  }

  test("dense cutover bulk-fetches through a partitioned JDBC scan on a live Derby") {
    // the 100 TB fetch path under the dense-diff cutover: JdbcEngine
    // exposes jdbcSource, so when the loop abandons bisection the leaf
    // rows arrive via spark.read.jdbc with one partition per leaf
    // predicate (normalization still computed in Derby's SQL — parity by
    // construction), not the single-threaded text bridge.
    assume(derbyAvailable, "no JDBC driver on the classpath")
    val spark = SparkTest.spark
    import spark.implicits._
    import graft.sources.{DerbyProfile, PushdownControl, PushdownDiffer, RemoteTable}
    val db = s"memory:graftdense${System.nanoTime()}"
    val setup = java.sql.DriverManager.getConnection(s"jdbc:derby:$db;create=true")
    try {
      def exec(sql: String): Unit = {
        val st = setup.createStatement()
        try st.executeUpdate(sql) finally st.close()
      }
      DerbyProfile.bootstrapSql.foreach(exec)
      exec("""CREATE TABLE dense ("k" BIGINT, "v" VARCHAR(30))""")
      val bRows = (1L to 2048L).map(i => (i, if (i % 2 == 0) s"v${i}X" else s"v$i"))
      bRows.grouped(500).foreach(g => exec("INSERT INTO dense VALUES " +
        g.map { case (k, v) => s"($k, '$v')" }.mkString(", ")))
      val a = (1L to 2048L).map(i => (i, s"v$i")).toDF("k", "v")
      val eng = new JdbcEngine(s"jdbc:derby:$db", new java.util.Properties(), DerbyProfile)
      try {
        val remote = RemoteTable.introspect(eng, "dense", Seq("k"), Seq("v"))
        val (out, stats) = PushdownDiffer.diffWithStats(
          graft.diff.TableSegment(a, Seq("k"), Seq("v")), remote,
          bisectionFactor = 4, bisectionThreshold = 64)
        assert(stats.denseCutoverAtLevel.nonEmpty, s"$stats")
        def norm(df: org.apache.spark.sql.DataFrame) = {
          val cols = graft.diff.Normalize.normalizedCols(df.schema, Seq("k", "v"))
          df.select(Seq("k", "v").zip(cols).map { case (n, c) => c.as(n) }: _*)
        }
        val want = graft.diff.JoinDiffer.diff(
          norm(a), norm(bRows.toDF("k", "v")), Seq("k"), Seq("v"))
          .collect().map(_.mkString("|")).toSet
        assert(want.size == 2048 && out.collect().map(_.mkString("|")).toSet == want)
      } finally eng.close()
    } finally {
      setup.close()
      scala.util.Try(java.sql.DriverManager.getConnection(s"jdbc:derby:$db;drop=true"))
    }
  }

  test("TERRITORY_BASED Derby collation: hex projection segments and diffs exactly") {
    // The round-7 gap: a full locale collation (TERRITORY_BASED, tertiary
    // strength — case-SENSITIVE but UCA-ordered) is incomparable with
    // binary and no case fold repairs it; the differ used to refuse. Now it
    // must run via the hex projection: all segmentation artifacts in
    // [0-9A-F] space where Derby's collator and Spark's binary order agree
    // by construction. Keys deliberately carry the poison characters
    // ('-', '_', mixed case) that sank both the raw and folded orderings.
    assume(derbyAvailable, "no JDBC driver on the classpath")
    val spark = SparkTest.spark
    import spark.implicits._
    import graft.sources.{Collation, DerbyProfile, PushdownDiffer, RemoteTable}
    val db = s"memory:graftterr${System.nanoTime()}"
    val setup = java.sql.DriverManager.getConnection(
      s"jdbc:derby:$db;create=true;territory=en_US;collation=TERRITORY_BASED")
    try {
      def exec(sql: String): Unit = {
        val st = setup.createStatement()
        try st.executeUpdate(sql) finally st.close()
      }
      exec("""CREATE TABLE terr ("k" VARCHAR(20), "v" VARCHAR(30))""")
      val n = 400
      def keyOf(i: Int) = f"k-${i}%03d_${if (i % 2 == 0) "A" else "z"}"
      // b side: values mutated in the low key range, one extra row, one missing
      val bRows = (1 to n).filterNot(_ == 77).map(i =>
        (keyOf(i), if (i <= 40) s"v$i!" else s"v$i")) :+ ("k-999_X", "only-b")
      bRows.grouped(200).foreach(g => exec("INSERT INTO terr VALUES " +
        g.map { case (k, v) => s"('$k', '$v')" }.mkString(", ")))
      // sanity: the collation genuinely disagrees with binary order —
      // UCA says 'a' < 'B' (primary a before b); binary says 'a' (0x61)
      // > 'B' (0x42)
      val st = setup.createStatement()
      val rs = st.executeQuery(
        "SELECT COUNT(*) FROM SYSIBM.SYSDUMMY1 WHERE 'a' < 'B'")
      rs.next()
      val ucaActive = rs.getInt(1)
      st.close()
      assert(ucaActive == 1, "TERRITORY_BASED ordering not active")
      val a = (1 to n).map(i => (keyOf(i), s"v$i")).toDF("k", "v")
      val eng = new JdbcEngine(s"jdbc:derby:$db", new java.util.Properties(), DerbyProfile)
      try {
        val territory = Collation(ordinal = Some(false), language = Some("en"),
          country = Some("US"), caseSensitive = Some(true), accentSensitive = Some(true))
        val remote = RemoteTable.introspect(eng, "terr", Seq("k"), Seq("v"),
          keyCollation = territory)
        val (out, stats) = PushdownDiffer.diffWithStats(
          graft.diff.TableSegment(a, Seq("k"), Seq("v")), remote,
          bisectionFactor = 4, bisectionThreshold = 32)
        assert(stats.levels >= 2 && stats.segmentsPruned > 0, s"$stats")
        val want = graft.diff.JoinDiffer.diff(
          a, bRows.toDF("k", "v"), Seq("k"), Seq("v"))
          .collect().map(_.mkString("|")).toSet
        // 40 mutated pairs + removed k-077 + added k-999_X
        assert(want.size == 82, s"${want.size}")
        assert(out.collect().map(_.mkString("|")).toSet == want)
        assert(stats.rowsFetched < n, s"must not ship the whole table: $stats")
      } finally eng.close()
    } finally {
      setup.close()
      scala.util.Try(java.sql.DriverManager.getConnection(s"jdbc:derby:$db;drop=true"))
    }
  }

  test("remote-remote across dialect families: Spark SQL side against live Derby JDBC side") {
    // neither side read by Spark directly: side A answers in Spark SQL,
    // side B in Derby's dialect over the real JDBC wire — the reference's
    // postgres-vs-mysql shape with two genuinely different SQL surfaces
    assume(derbyAvailable, "no JDBC driver on the classpath")
    val spark = SparkTest.spark
    import spark.implicits._
    import graft.sources.{DerbyProfile, SparkViewEngine}
    val db = s"memory:graftrr${System.nanoTime()}"
    val setup = java.sql.DriverManager.getConnection(s"jdbc:derby:$db;create=true")
    try {
      def exec(sql: String): Unit = {
        val st = setup.createStatement()
        try st.executeUpdate(sql) finally st.close()
      }
      DerbyProfile.bootstrapSql.foreach(exec)
      exec("""CREATE TABLE rrb ("k" BIGINT, "v" VARCHAR(30))""")
      val bRows = (1L to 400L).filterNot(_ % 71 == 0)
        .map(i => (i, if (i % 29 == 0) s"V$i!" else s"v$i"))
      exec("INSERT INTO rrb VALUES " +
        bRows.map { case (k, v) => s"($k, '$v')" }.mkString(", "))
      val a = (1L to 400L).map(i => (i, s"v$i")).toDF("k", "v")
      a.createOrReplaceTempView("rr_derby_a")
      val eng = new JdbcEngine(s"jdbc:derby:$db", new java.util.Properties(), DerbyProfile)
      try {
        val out = graft.api.Graft.diffRemotes(spark,
          new SparkViewEngine(spark), "rr_derby_a", eng, "rrb",
          Seq("k"), Seq("v"), bisectionFactor = 4, bisectionThreshold = 32)
        def norm(df: org.apache.spark.sql.DataFrame) = {
          val cols = graft.diff.Normalize.normalizedCols(df.schema, Seq("k", "v"))
          df.select(Seq("k", "v").zip(cols).map { case (n, c) => c.as(n) }: _*)
        }
        val want = graft.diff.JoinDiffer.diff(
          norm(a), norm(bRows.toDF("k", "v")), Seq("k"), Seq("v"))
          .collect().map(_.mkString("|")).toSet
        assert(want.nonEmpty && out.collect().map(_.mkString("|")).toSet == want)
      } finally eng.close()
    } finally {
      setup.close()
      scala.util.Try(java.sql.DriverManager.getConnection(s"jdbc:derby:$db;drop=true"))
    }
  }

  test("case-insensitive Derby collation: folded key bounds select the same rows as Spark's fold") {
    // A live TERRITORY_BASED:SECONDARY database — Derby's real
    // case-insensitive collation, the class PushdownDiffer now absorbs by
    // case-folding segmentation on both sides. Two things must hold on real
    // collated comparisons: (1) the RAW bound predicate genuinely disagrees
    // with Spark's binary ordering (the hazard is real, not hypothetical),
    // and (2) the folded predicate the differ emits (UPPER(k) between
    // folded bounds) selects exactly the rows Spark's folded bounds select.
    assume(derbyAvailable, "no JDBC driver on the classpath")
    val spark = SparkTest.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, upper}
    val db = s"memory:graftci${System.nanoTime()}"
    val setup = java.sql.DriverManager.getConnection(
      s"jdbc:derby:$db;create=true;territory=en_US;collation=TERRITORY_BASED:SECONDARY")
    try {
      val st = setup.createStatement()
      st.executeUpdate("CREATE TABLE ci (k VARCHAR(10))")
      st.executeUpdate("INSERT INTO ci VALUES ('a1'),('A2'),('a3'),('B4'),('b5'),('c6')")
      // sanity: the database really is case-insensitive
      val eqRs = st.executeQuery("SELECT COUNT(*) FROM ci WHERE k = 'A1'")
      eqRs.next(); assert(eqRs.getInt(1) == 1, "SECONDARY collation not active")
      def derbyCount(where: String): Int = {
        val rs = st.executeQuery(s"SELECT COUNT(*) FROM ci WHERE $where")
        rs.next(); rs.getInt(1)
      }
      val local = Seq("a1", "A2", "a3", "B4", "b5", "c6").toDF("k")
      val rawDerby = derbyCount("k >= 'A2' AND k < 'B5'")
      val rawSpark = local.where(col("k") >= "A2" && col("k") < "B5").count()
      assert(rawDerby == 3 && rawSpark == 2,
        s"expected raw orderings to disagree (derby=$rawDerby spark=$rawSpark) — " +
          "if they agree the fold has nothing to prove")
      val foldedDerby = derbyCount("UPPER(k) >= 'A2' AND UPPER(k) < 'B5'")
      val foldedSpark = local.where(upper(col("k")) >= "A2" && upper(col("k")) < "B5").count()
      assert(foldedDerby == 3 && foldedSpark == 3,
        s"folded bounds must agree: derby=$foldedDerby spark=$foldedSpark")
      st.close()
    } finally {
      setup.close()
      scala.util.Try(java.sql.DriverManager.getConnection(s"jdbc:derby:$db;drop=true"))
    }
  }
}
