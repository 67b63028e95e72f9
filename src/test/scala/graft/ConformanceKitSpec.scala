package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.diff.{JoinDiffer, Normalize, TableSegment}
import graft.sources._

/** DIALECT CONFORMANCE KIT — the single battery that qualifies ANY
  * `RemoteEngine` transport + `SourceProfile` pairing as diff-ready.
  * Everything a dialect must get right to interoperate runs in three
  * tests, all driven through the PRODUCTION seams (profile-rendered DDL,
  * `RemoteRepair` literal inserts, `RemoteTable.introspect`,
  * `Graft.diffPushdownIntrospected`):
  *
  *  1. INTROSPECTION — catalog types land on the right Spark logical
  *     types with precision/scale intact.
  *  2. CHECKSUM PARITY — seeded mixed-type rows (nulls, unicode, quotes,
  *     decimals, doubles, timestamps, dates, booleans) produce the exact
  *     `count + sum(md5_int48(normalized_row))` the Spark side computes,
  *     and a one-character mutation moves the checksum.
  *  3. PUSHDOWN LOOP — the full bisection diff over the live transport
  *     emits rows bit-identical to a local joindiff, with clean segments
  *     actually PRUNED (so a checksum-rendering break cannot hide behind
  *     a correct-but-prune-free run).
  *
  * Wiring a new warehouse the day a socket exists is ONE subclass naming
  * the engine factory (see the three live instances below — DuckDB over
  * the text-protocol process bridge, embedded Derby over JDBC, and a real
  * HiveServer2 Thrift socket). The 10 profiles the sandbox cannot reach
  * (`Profiles.scala`) are golden-pinned elsewhere; this kit is what turns
  * each of them live with one line.
  */
abstract class DialectConformanceKit extends AnyFunSuite {
  def engineName: String
  /** false skips the battery (driver/transport absent in this sandbox). */
  def engineAvailable: Boolean = true
  /** Fresh engine; the kit closes it. */
  def openEngine(): RemoteEngine
  /** Namespace for created tables (Thrift needs global_temp-free managed
    * tables in the shared warehouse; default is none). */
  def tableFor(base: String): String =
    base + "_" + java.util.UUID.randomUUID().toString.take(8).replace("-", "")

  lazy val spark = SparkTest.spark

  private def withEngine[T](f: RemoteEngine => T): T = {
    assume(engineAvailable, s"$engineName unavailable in this sandbox")
    val eng = openEngine()
    try f(eng) finally eng.close()
  }

  // ---- seeded mixed-type battery rows -----------------------------------
  private val confSchema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("s", StringType, nullable = true),
    StructField("d", DecimalType(12, 2), nullable = true),
    StructField("x", DoubleType, nullable = true),
    StructField("b", BooleanType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("dt", DateType, nullable = true)))

  private def confRows: Seq[Row] = (1 to 120).map { i =>
    def opt[T](v: T): Any = if (i % 13 == 0) null else v
    val s =
      if (i % 17 == 0) "quo'te\"x"
      else if (i % 11 == 0) s"unicodé-λ$i"
      else if (i % 7 == 0) ""
      else s"v$i"
    // doubles stay dyadic (exact in both binary and the decimal literal
    // every dialect parses); one E-notation row exercises the
    // approximate-literal path
    val x: Double = if (i % 19 == 0) 1.5e-9 else i * 0.25 - 7.5
    val ts = {
      val t = new java.sql.Timestamp(1700000000000L + i * 97003L)
      t.setNanos(((i * 137) % 1000) * 1000000 + ((i * 31) % 1000) * 1000)
      t
    }
    Row(i.toLong, opt(s),
      opt(new java.math.BigDecimal(s"${i * 7}.${10 + i % 89}")),
      opt(x), opt(i % 2 == 0), opt(ts),
      opt(java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(19000L + i * 3))))
  }

  private def confDf: DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(confRows: _*), confSchema)

  /** String columns get ANSI VARCHAR(200), not the profile's unbounded
    * text type: several dialects restrict their unbounded type in
    * predicates and function arguments (Derby's LONG VARCHAR cannot be
    * compared), and a bounded VARCHAR is what diffed PK/value columns
    * look like in practice. */
  private def ddlType(p: SourceProfile, dt: DataType): String =
    if (dt == StringType) "VARCHAR(200)" else p.sqlTypeSql(dt)

  private def createAndFill(eng: RemoteEngine, table: String): Unit = {
    val p = eng.profile
    eng.update(s"CREATE TABLE $table (" + confSchema.fields.map(f =>
      s"${p.quote(f.name)} ${ddlType(p, f.dataType)}").mkString(", ") + ")")
    RemoteRepair.insertStatements(p, table, confSchema.fieldNames.toSeq,
      confRows.iterator, 32).foreach(eng.update)
  }

  private def dropQuietly(eng: RemoteEngine, table: String): Unit =
    scala.util.Try(eng.update(s"DROP TABLE $table")): Unit

  test(s"conformance[$engineName]: introspection resolves catalog types and precision") {
    withEngine { eng =>
      val t = tableFor("conf_intro")
      createAndFill(eng, t)
      try {
        val rt = RemoteTable.introspect(eng, t, Seq("k"), confSchema.fieldNames.toSeq)
        val got = confSchema.fieldNames.map(n => n -> rt.schema(n).dataType).toMap
        assert(got("k") == LongType, s"$got")
        assert(got("s") == StringType, s"$got")
        assert(got("d") == DecimalType(12, 2), s"$got")
        assert(got("x") == DoubleType, s"$got")
        assert(got("b") == BooleanType, s"$got")
        assert(Set[DataType](TimestampType, TimestampNTZType).contains(got("ts")), s"$got")
        assert(got("dt") == DateType, s"$got")
      } finally dropQuietly(eng, t)
    }
  }

  test(s"conformance[$engineName]: mixed-type checksum parity, mutation-sensitive") {
    withEngine { eng =>
      val p = eng.profile
      val t = tableFor("conf_ck")
      createAndFill(eng, t)
      try {
        val normalized = confSchema.fields.map(f =>
          p.normalizedColumnSql(f.name, f.dataType)).toIndexedSeq
        val remote = eng.query(p.checksumQuerySql(t, normalized)).head
        val (remoteCnt, remoteSum) =
          (remote(0).get.trim.toLong, BigDecimal(remote(1).get.trim))
        val (localCnt, localSum) = TableSegment(confDf, Seq("k")).countAndChecksum()
        assert(localCnt == remoteCnt, s"row counts disagree: $localCnt vs $remoteCnt")
        assert(localSum.contains(remoteSum),
          s"checksums disagree vs ${p.name}: spark=$localSum remote=$remoteSum")
        // parity must not be vacuous: one extra row moves count AND sum
        // (INSERT, not UPDATE — Spark managed parquet tables over the
        // Thrift transport support only append)
        RemoteRepair.insertStatements(p, t, confSchema.fieldNames.toSeq,
          Iterator(Row(9999L, "MUTATED", new java.math.BigDecimal("1.23"),
            0.5, true, new java.sql.Timestamp(1700000000000L),
            java.sql.Date.valueOf("2024-01-01"))), 1).foreach(eng.update)
        val mutated = eng.query(p.checksumQuerySql(t, normalized)).head
        assert(mutated(0).get.trim.toLong == remoteCnt + 1 &&
          BigDecimal(mutated(1).get.trim) != remoteSum,
          "mutation did not move the checksum")
      } finally dropQuietly(eng, t)
    }
  }

  test(s"conformance[$engineName]: pushdown loop prunes clean segments, rows equal joindiff") {
    withEngine { eng =>
      import spark.implicits._
      val t = tableFor("conf_pd")
      val p = eng.profile
      val n = 1500
      val bRows = (1L to n.toLong).filterNot(_ % 53 == 0)
        .map(i => (i, if (i % 97 == 0) s"S$i!" else s"s$i", i * 0.25))
      eng.update(s"CREATE TABLE $t (${p.quote("k")} ${ddlType(p, LongType)}, " +
        s"${p.quote("s")} ${ddlType(p, StringType)}, " +
        s"${p.quote("d")} ${ddlType(p, DoubleType)})")
      try {
        RemoteRepair.insertStatements(p, t, Seq("k", "s", "d"),
          bRows.iterator.map(r => Row(r._1, r._2, r._3)), 256).foreach(eng.update)
        val a = (1L to n.toLong).map(i => (i, s"s$i", i * 0.25)).toDF("k", "s", "d")
        var prunedTotal = 0
        val ctrl = new PushdownControl() {
          override def onLevel(info: PushdownLevel): Unit = prunedTotal += info.pruned
        }
        val out = graft.api.Graft.diffPushdownIntrospected(
          TableSegment(a, Seq("k")), eng, t,
          bisectionFactor = 4, bisectionThreshold = 64, control = ctrl)
        def norm(df: DataFrame) = {
          val cols = Normalize.normalizedCols(df.schema, Seq("k", "s", "d"))
          df.select(Seq("k", "s", "d").zip(cols).map { case (nm, c) => c.as(nm) }: _*)
        }
        val want = JoinDiffer.diff(norm(a), norm(bRows.toDF("k", "s", "d")),
          Seq("k"), Seq("s", "d")).collect().map(_.mkString("|")).toSet
        assert(want.nonEmpty, "fixture produced no diff — conformance would be vacuous")
        assert(out.collect().map(_.mkString("|")).toSet == want)
        assert(prunedTotal > 0,
          "no segment ever pruned — checksums are not bit-compatible over this transport")
      } finally dropQuietly(eng, t)
    }
  }
}

/** Live engine #1: DuckDB behind the text-protocol process bridge. */
class DuckDbConformanceSpec extends DialectConformanceKit {
  def engineName = "duckdb"
  def openEngine(): RemoteEngine =
    new ProcessEngine(Seq("python3", "-c", DuckDbProcess.BridgeScript), DuckDbProfile)
}

/** Live engine #2: embedded Derby over real JDBC. */
class DerbyConformanceSpec extends DialectConformanceKit {
  def engineName = "derby"
  override def engineAvailable: Boolean =
    scala.util.Try(Class.forName("org.apache.derby.jdbc.EmbeddedDriver")).isSuccess
  def openEngine(): RemoteEngine = {
    val url = "jdbc:derby:memory:conf_" + java.util.UUID.randomUUID().toString.take(8)
    java.sql.DriverManager.getConnection(s"$url;create=true").close()
    new JdbcEngine(url, new java.util.Properties(), DerbyProfile)
  }
}

/** Live engine #3: a real HiveServer2 Thrift socket served by this JVM's
  * Spark session — the HiveThriftSpec transport, run through the kit.
  *
  * LOOPBACK CAVEAT: the server runs on the SAME local[4] scheduler as the
  * kit, so the partitioned `spark.read.jdbc` leaf fetch would deadlock —
  * every task slot holds a scan task blocked on a socket whose statement
  * needs a slot on the same scheduler to execute (observed live: 4/4
  * slots in Socket.read, zero progress). The engine therefore hides
  * `jdbcSource`, draining leaves through the batched text protocol — a
  * fully supported production path — while checksums, introspection, and
  * bisection still cross the real TCP socket. A REMOTE warehouse (its own
  * cluster) has no such cycle and keeps the partitioned fetch. */
class ThriftConformanceSpec extends DialectConformanceKit {
  def engineName = "thrift"
  override def engineAvailable: Boolean =
    scala.util.Try(Class.forName(
      "org.apache.spark.sql.hive.thriftserver.HiveThriftServer2")).isSuccess &&
      scala.util.Try(Class.forName("org.apache.hive.jdbc.HiveDriver")).isSuccess
  def openEngine(): RemoteEngine = {
    val props = new java.util.Properties()
    props.setProperty("user", "anonymous")
    val inner = new JdbcEngine(ThriftConformanceSpec.url(spark), props, SparkProfile)
    new RemoteEngine { // text-protocol face: jdbcSource stays None
      def profile = inner.profile
      def query(sql: String) = inner.query(sql)
      override def update(sql: String): Unit = inner.update(sql)
      override def close(): Unit = inner.close()
    }
  }
}

object ThriftConformanceSpec {
  // one server per JVM (HiveServer2 bakes its port into the shared
  // session's hiveconf at first start — see HiveThriftSpec); never stopped
  // so late suites in the same JVM can still connect
  private var started: Option[String] = None
  def url(spark: org.apache.spark.sql.SparkSession): String = synchronized {
    started.getOrElse {
      val port = {
        val ss = new java.net.ServerSocket(0)
        try ss.getLocalPort finally ss.close()
      }
      spark.conf.set("hive.server2.thrift.port", port.toString)
      spark.conf.set("hive.server2.thrift.bind.host", "localhost")
      org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
        .startWithContext(spark.sqlContext)
      val u = s"jdbc:hive2://localhost:$port/default"
      val props = new java.util.Properties()
      props.setProperty("user", "anonymous")
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var up = false
      while (!up) {
        try { java.sql.DriverManager.getConnection(u, props).close(); up = true }
        catch {
          case e: Exception =>
            if (System.nanoTime() > deadline) throw e
            Thread.sleep(500)
        }
      }
      started = Some(u)
      u
    }
  }
}
