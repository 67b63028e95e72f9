package graft

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.sources._

/** RemoteRepair: diff → batched DELETE/INSERT on a live remote → re-diff
  * shows zero drift. Two live engine families (embedded Derby over real
  * JDBC; DuckDB over the process bridge) plus literal-rendering units. */
class RepairSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  private def derbyAvailable: Boolean =
    scala.util.Try(Class.forName("org.apache.derby.jdbc.EmbeddedDriver")).isSuccess

  test("valueLiteral renders every repair type exactly and refuses the unrenderable") {
    val p = DuckDbProfile
    assert(RemoteRepair.valueLiteral(p, null) == "NULL")
    assert(RemoteRepair.valueLiteral(p, "o'brien") == "'o''brien'")
    assert(RemoteRepair.valueLiteral(p, 42L) == "42")
    assert(RemoteRepair.valueLiteral(p, true) == "TRUE")
    assert(RemoteRepair.valueLiteral(p, java.sql.Date.valueOf("2026-01-31")) ==
      "DATE '2026-01-31'")
    assert(RemoteRepair.valueLiteral(p,
      java.sql.Timestamp.valueOf("2026-01-31 12:34:56.789")).startsWith("TIMESTAMP '2026-01-31 12:34:56.789"))
    assert(RemoteRepair.valueLiteral(p, new java.math.BigDecimal("12.3400")) == "12.3400")
    // shortest-repr doubles round-trip bit-exactly through parse
    val d = 0.1 + 0.2
    assert(RemoteRepair.valueLiteral(p, d).toDouble == d)
    intercept[IllegalArgumentException](RemoteRepair.valueLiteral(p, Double.NaN))
    intercept[IllegalArgumentException](RemoteRepair.valueLiteral(p, new Object))
  }

  test("delete batches compress single keys to IN lists; compound keys to OR'd conjunctions") {
    val p = DuckDbProfile
    import org.apache.spark.sql.Row
    val dels = RemoteRepair.deleteStatements(p, "t", Seq("k"),
      Iterator(Row(1L), Row(2L), Row(3L)), maxPerStatement = 2).toSeq
    assert(dels == Seq("""DELETE FROM t WHERE "k" IN (1, 2)""",
      """DELETE FROM t WHERE "k" IN (3)"""))
    val comp = RemoteRepair.deleteStatements(p, "t", Seq("k1", "k2"),
      Iterator(Row(1L, "x"), Row(2L, null)), maxPerStatement = 16).toSeq
    assert(comp == Seq(
      """DELETE FROM t WHERE ("k1" = 1 AND "k2" = 'x') OR ("k1" = 2 AND "k2" IS NULL)"""))
  }

  test("repair reconciles a live Derby remote: re-diff after repair is empty") {
    assume(derbyAvailable, "no JDBC driver on the classpath")
    import spark.implicits._
    val db = s"memory:graftrep${System.nanoTime()}"
    val setup = java.sql.DriverManager.getConnection(s"jdbc:derby:$db;create=true")
    try {
      def exec(sql: String): Unit = {
        val st = setup.createStatement()
        try st.executeUpdate(sql) finally st.close()
      }
      exec("""CREATE TABLE rep ("k" BIGINT, "s" VARCHAR(30), "d" DOUBLE, "t" TIMESTAMP)""")
      val ts = (i: Long) => java.sql.Timestamp.valueOf(s"2026-01-0${i % 9 + 1} 10:00:00.${i % 1000}")
      val aRows = (1L to 500L).map(i => (i, s"s'$i", i + 0.25, ts(i)))
      // remote drift: deletes (%83), updates (%37), spurious inserts (keys past the end)
      val bRows = aRows.filterNot(_._1 % 83 == 0)
        .map { case (k, s, d, t) => if (k % 37 == 0) (k, s + "!", d + 1.0, t) else (k, s, d, t) } ++
        (1L to 5L).map(i => (1000L + i, "ghost", 0.0, ts(i)))
      val a = aRows.toDF("k", "s", "d", "t")
      val eng = new JdbcEngine(s"jdbc:derby:$db", new java.util.Properties(), DerbyProfile)
      try {
        RemoteRepair.insertStatements(DerbyProfile, "rep", Seq("k", "s", "d", "t"),
          bRows.toDF("k", "s", "d", "t").toLocalIterator().asScala, 64).foreach(eng.update)
        // diff through the PRODUCTION pushdown loop (typed local side,
        // live remote), repair from it, then re-run the same loop
        def liveDiff() = graft.api.Graft.diffPushdownIntrospected(
          graft.diff.TableSegment(a, Seq("k")), eng, "rep",
          bisectionFactor = 4, bisectionThreshold = 64)
        val d0 = liveDiff().collect()
        assert(d0.nonEmpty, "fixture produced no diff — test is vacuous")
        val stats = RemoteRepair.repair(eng, "rep", Seq("k"), a, liveDiff())
        assert(stats.deletedKeys > 0 && stats.insertedRows > 0)
        assert(liveDiff().collect().isEmpty,
          s"remote still drifted after repair ($stats)")
      } finally eng.close()
    } finally {
      setup.close()
      scala.util.Try(java.sql.DriverManager.getConnection(s"jdbc:derby:$db;drop=true"))
    }
  }

  test("repair round-trips hostile values through a live Derby exactly") {
    // every value class the literal renderer claims to handle, in its
    // nastiest form: quote/backslash/newline/tab strings, non-BMP unicode,
    // empty string, NULL, denormal-adjacent doubles, negative zero,
    // shortest-repr artifacts, fractional timestamps — inserted via repair
    // statements, then PROVEN equal by the production pushdown re-diff
    // (normalization-aware, checksum-exact) coming back empty
    assume(derbyAvailable, "no JDBC driver on the classpath")
    import spark.implicits._
    val db = s"memory:graftfz${System.nanoTime()}"
    val setup = java.sql.DriverManager.getConnection(s"jdbc:derby:$db;create=true")
    try {
      def exec(sql: String): Unit = {
        val st = setup.createStatement()
        try st.executeUpdate(sql) finally st.close()
      }
      exec("""CREATE TABLE fz ("k" BIGINT, "s" VARCHAR(100), "d" DOUBLE, "t" TIMESTAMP)""")
      val ts = java.sql.Timestamp.valueOf("2026-02-28 23:59:59.999")
      val hostile: Seq[(Long, Option[String], Double, java.sql.Timestamp)] = Seq(
        (1L, Some("o'brien ''double'' '"), 0.1 + 0.2, ts),
        // magnitudes stay inside DECIMAL(38,2) — the diff's fraction
        // normalization domain on EVERY engine (local and pushdown SQL both
        // cast to DECIMAL(38,2); beyond it the diff fails LOUDLY with an
        // ANSI overflow, which is the documented contract, not a repair
        // concern)
        (2L, Some("back\\slash and \"quotes\""), 1e30, ts),
        (3L, Some("line\nbreak\ttab"), 1e-30, ts),
        (4L, Some("héllo wörld 日本語 🚀"), -0.0, ts),
        (5L, Some(""), -9.87654321e35, ts),
        (6L, None, 4.9e-324, java.sql.Timestamp.valueOf("1970-01-01 00:00:00.001")),
        (7L, Some("plain"), 12345.678901234567, ts))
      val a = hostile.toDF("k", "s", "d", "t")
      val eng = new JdbcEngine(s"jdbc:derby:$db", new java.util.Properties(), DerbyProfile)
      try {
        // remote starts EMPTY: the diff is all '-', repair must insert
        // every hostile row through rendered SQL literals
        def liveDiff() = graft.api.Graft.diffPushdownIntrospected(
          graft.diff.TableSegment(a, Seq("k")), eng, "fz",
          bisectionFactor = 4, bisectionThreshold = 64)
        val stats = RemoteRepair.repair(eng, "fz", Seq("k"), a, liveDiff())
        assert(stats.insertedRows == 7L)
        assert(liveDiff().collect().isEmpty,
          "hostile values did not round-trip through repair literals")
      } finally eng.close()
    } finally {
      setup.close()
      scala.util.Try(java.sql.DriverManager.getConnection(s"jdbc:derby:$db;drop=true"))
    }
  }

  test("repair refuses a local source that does not cover the remote schema") {
    // The partial-column hazard: DELETE+INSERT rebuilds repaired rows from
    // the local source alone, so a remote column missing there (a
    // --columns/--ignore'd diff) would be silently NULLed on every
    // repaired row. The guard must refuse BEFORE issuing any statement.
    import spark.implicits._
    val eng = DuckDbProcess.engine()
    try {
      eng.update("""CREATE TABLE guard ("k" BIGINT, "v" VARCHAR, "audit_note" VARCHAR)""")
      eng.update("""INSERT INTO guard VALUES (1, 'x', 'precious')""")
      val partial = Seq((1L, "y")).toDF("k", "v") // no audit_note
      val diff = Seq(("-", 1L, "y"), ("+", 1L, "x")).toDF("sign", "k", "v")
      val e = intercept[IllegalArgumentException] {
        RemoteRepair.repair(eng, "guard", Seq("k"), partial, diff)
      }
      assert(e.getMessage.contains("repair refused") &&
        e.getMessage.contains("audit_note"), e.getMessage)
      // nothing was deleted: the un-diffed column survives untouched
      assert(eng.query("""SELECT "audit_note" FROM guard""").head.head.contains("precious"))
    } finally eng.close()
  }

  test("repair refuses dense damage above the fraction guard, runs when forced") {
    import spark.implicits._
    val eng = DuckDbProcess.engine()
    try {
      eng.update("""CREATE TABLE dense ("k" BIGINT, "v" VARCHAR)""")
      val aRows = (1L to 100L).map(i => (i, s"v$i"))
      // remote: EVERY row drifted
      eng.update("INSERT INTO dense VALUES " +
        aRows.map { case (k, v) => s"($k, '${v}X')" }.mkString(", "))
      val a = aRows.toDF("k", "v")
      def liveDiff() = graft.api.Graft.diffPushdownIntrospected(
        graft.diff.TableSegment(a, Seq("k")), eng, "dense",
        bisectionFactor = 4, bisectionThreshold = 64)
      val e = intercept[IllegalArgumentException] {
        RemoteRepair.repair(eng, "dense", Seq("k"), a, liveDiff(),
          maxDamageFraction = 0.5, maxDamageKeys = 10)
      }
      assert(e.getMessage.contains("dense repair refused") &&
        e.getMessage.contains("bulk-reload"), e.getMessage)
      // forcing the fraction off repairs row-by-row as before
      RemoteRepair.repair(eng, "dense", Seq("k"), a, liveDiff(),
        maxDamageFraction = 1.0, maxDamageKeys = 10)
      assert(liveDiff().collect().isEmpty)
    } finally eng.close()
  }

  test("remote materialize writes typed columns and survives >4000-char values") {
    import spark.implicits._
    val eng = DuckDbProcess.engine()
    try {
      val long = "x" * 6000 // would not fit the old VARCHAR(4000) columns
      val diff = Seq(
        ("-", 1L, 2.5, java.sql.Timestamp.valueOf("2026-03-01 12:00:00.123456"), long),
        ("+", 1L, 3.5, java.sql.Timestamp.valueOf("2026-03-01 12:00:00.123456"), "short"))
        .toDF("sign", "k", "d", "t", "s")
      val n = RemoteRepair.materializeDiffRemote(eng, "mat_typed", diff)
      assert(n == 2)
      val types = eng.query(
        """SELECT column_name, data_type FROM information_schema.columns
          |WHERE table_name = 'mat_typed' ORDER BY ordinal_position""".stripMargin)
        .map(r => (r(0).get, r(1).get))
      assert(types == Seq(("sign", "VARCHAR"), ("k", "BIGINT"), ("d", "DOUBLE"),
        ("t", "TIMESTAMP"), ("s", "VARCHAR")), s"got $types")
      val got = eng.query(
        """SELECT "sign", "k", "d", length("s") FROM mat_typed ORDER BY "sign"""")
        .map(_.map(_.get))
      assert(got == Seq(Seq("+", "1", "3.5", "5"), Seq("-", "1", "2.5", "6000")), s"got $got")
    } finally eng.close()
  }

  test("repair reconciles a live DuckDB remote through the text bridge") {
    import spark.implicits._
    val eng = DuckDbProcess.engine()
    try {
      eng.update("""CREATE TABLE rep ("k" BIGINT, "s" VARCHAR, "d" DOUBLE)""")
      val aRows = (1L to 300L).map(i => (i, s"s$i", i + 0.5))
      val bRows = aRows.filterNot(_._1 % 71 == 0)
        .map { case (k, s, d) => if (k % 29 == 0) (k, s + "!", d) else (k, s, d) } ++
        Seq((900L, "ghost", 0.0))
      RemoteRepair.insertStatements(DuckDbProfile, "rep", Seq("k", "s", "d"),
        bRows.toDF("k", "s", "d").toLocalIterator().asScala, 64).foreach(eng.update)
      val a = aRows.toDF("k", "s", "d")
      def liveDiff() = graft.api.Graft.diffPushdownIntrospected(
        graft.diff.TableSegment(a, Seq("k")), eng, "rep",
        bisectionFactor = 4, bisectionThreshold = 64)
      assert(liveDiff().collect().nonEmpty)
      RemoteRepair.repair(eng, "rep", Seq("k"), a, liveDiff())
      assert(liveDiff().collect().isEmpty)
    } finally eng.close()
  }
}
