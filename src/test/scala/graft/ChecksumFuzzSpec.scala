package graft

import java.time.Instant
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.diff.{HashDiffer, JoinDiffer, TableSegment}
import graft.sources.{DuckDbProfile, DuckDbProcess, ProcessEngine}

/** Seeded randomized cross-engine checksum parity: N rows of mixed types —
  * nulls, unicode, quotes/pipes, the `<null>` sentinel as DATA, negative
  * and tie-adjacent numerics, micro-precision timestamps — inserted into a
  * live DuckDB and checksummed there via the profile's SQL, must match
  * `TableSegment.countAndChecksum` on the same rows bit-for-bit. The
  * TPC-H-shaped live tests cover realistic data; this one hunts the
  * rendering edges (sign, rounding, padding, escaping) where cross-engine
  * normalization bugs actually live.
  */
class ChecksumFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  private val TsFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS").withZone(ZoneOffset.UTC)

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("d", DecimalType(12, 2)),
    StructField("x", DoubleType),
    StructField("s", StringType),
    StructField("ts", TimestampType),
    StructField("b", BooleanType),
    StructField("dt", DateType)))

  private type FuzzRow = (Long, Option[java.math.BigDecimal], Option[Double],
    Option[String], Option[Long], Option[Boolean], Option[Int])

  /** Same SEED → same rows on every engine under test: nulls, unicode,
    * quotes/pipes, the `<null>` sentinel as data, rounding-tie doubles,
    * micro-precision timestamps. */
  private def mixedRows(seed: Long): Seq[FuzzRow] = {
    val rnd = new scala.util.Random(seed)
    def opt[T](f: => T): Option[T] = if (rnd.nextInt(100) < 12) None else Some(f)
    val stringPool = Seq("", " ", "  padded  ", "<null>", "a|b", "it's", "quote\"d",
      "日本語テキスト", "emoji ❤", "NaN", "null", "0", "-0.00")
    def randString(): String =
      if (rnd.nextInt(3) == 0) stringPool(rnd.nextInt(stringPool.length))
      else rnd.alphanumeric.take(rnd.nextInt(12)).mkString
    def randDec(): java.math.BigDecimal =
      new java.math.BigDecimal(java.math.BigInteger.valueOf(rnd.nextLong() % 999999999L), 2)
    def randDouble(): Double = rnd.nextInt(8) match {
      case 0 => 0.005
      case 1 => -0.005
      case 2 => -0.0
      case 3 => 1.0050000000001
      case 4 => 1e-9
      case _ => (rnd.nextDouble() - 0.5) * 1e6
    }
    def randMicros(): Long = {
      val base = rnd.between(0L, 2051222400L) // 1970..2035, seconds
      rnd.nextInt(3) match {
        case 0 => base * 1000000L                       // exact second
        case 1 => base * 1000000L + rnd.nextInt(1000) * 1000L // exact millis
        case _ => base * 1000000L + rnd.between(0L, 1000000L) // full micros
      }
    }
    (1L to 300L).map { k =>
      (k, opt(randDec()), opt(randDouble()), opt(randString()),
        opt(randMicros()), opt(rnd.nextBoolean()), opt(rnd.between(0, 24000))) // dates 1970..~2035
    }
  }

  private def sparkDf(rows: Seq[FuzzRow]) = {
    val sparkRows = rows.map { case (k, d, x, s, ts, b, dt) =>
      Row(k, d.orNull, x.map(Double.box).orNull, s.orNull,
        ts.map(m => java.sql.Timestamp.from(Instant.ofEpochSecond(m / 1000000L, (m % 1000000L) * 1000L))).orNull,
        b.map(Boolean.box).orNull,
        dt.map(days => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.toLong))).orNull)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(sparkRows, 4), schema)
  }

  private def strLit(v: String): String = "'" + v.replace("'", "''") + "'"
  private def tsText(m: Long): String =
    TsFmt.format(Instant.ofEpochSecond(m / 1000000L, (m % 1000000L) * 1000L))
  private def dateText(days: Int): String =
    java.time.LocalDate.ofEpochDay(days.toLong).toString

  /** Run the profile's own checksum SQL on a live engine holding `rows` and
    * assert bit-parity with `TableSegment.countAndChecksum`, then mutate one
    * character remotely and assert the checksum moves (parity not vacuous). */
  private def assertChecksumParity(rows: Seq[FuzzRow],
      eng: graft.sources.RemoteEngine, profile: graft.sources.SourceProfile,
      table: String, mutate: String => Unit): Unit = {
    val normalized = schema.fields.map(f =>
      profile.normalizedColumnSql(f.name, f.dataType)).toIndexedSeq
    val remote = eng.query(profile.checksumQuerySql(table, normalized)).head
    val (remoteCnt, remoteSum) = (remote(0).get.trim.toLong, BigDecimal(remote(1).get.trim))
    val (localCnt, localSum) = TableSegment(sparkDf(rows), Seq("k")).countAndChecksum()
    assert(localCnt == remoteCnt)
    if (!localSum.contains(remoteSum)) {
      // localize the divergence: pull the normalized projection from BOTH
      // sides and report the first differing rows column by column
      val rel = schema.fields.map(_.name).toSeq
      val remoteRows = eng.query(profile.selectNormalizedSql(table,
        rel.map(c => (profile.normalizedColumnSql(c, schema(c).dataType), c))))
        .map(r => r.head.get.trim -> r).toMap
      val df = sparkDf(rows)
      val localRows = df.select(rel.zip(
          graft.diff.Normalize.normalizedCols(df.schema, rel)).map { case (n, c) => c.as(n) }: _*)
        .collect().map(r => r.getString(0) ->
          (0 until r.length).map(i => Option(r.get(i)).map(_.toString)).toSeq).toMap
      val diffs = localRows.keys.toSeq.sortBy(_.toLong).flatMap { k =>
        remoteRows.get(k) match {
          case None => Some(s"k=$k missing remotely")
          case Some(rr) if rr != localRows(k) =>
            Some(s"k=$k\n  local : ${localRows(k)}\n  remote: $rr")
          case _ => None
        }
      }
      // normalized projections can agree while the CONCAT diverges — compare
      // per-row checksums too
      val remoteCk = eng.query(profile.selectNormalizedSql(table, Seq(
          (profile.toStringSql(profile.quote("k")), "k"),
          (profile.md5AsIntSql(profile.concatSql(normalized)), "ck"))))
        .map(r => r(0).get.trim -> BigDecimal(r(1).get.trim)).toMap
      import org.apache.spark.sql.functions.col
      val localCk = df.select(col("k").cast("string"),
          graft.diff.Checksum.rowChecksum(
            graft.diff.Normalize.normalizedCols(df.schema, rel)).cast("decimal(38,0)"))
        .collect().map(r => r.getString(0) -> BigDecimal(r.getDecimal(1))).toMap
      val ckDiffs = localCk.keys.toSeq.sortBy(_.toLong)
        .filter(k => remoteCk.get(k) != Some(localCk(k)))
        .map(k => s"k=$k localCk=${localCk(k)} remoteCk=${remoteCk.get(k)} " +
          s"localRow=${localRows(k)}")
      fail(s"checksum mismatch vs ${profile.name}: spark=$localSum remote=$remoteSum; " +
        s"differing normalized rows:\n${diffs.take(5).mkString("\n")}\n" +
        s"differing row checksums:\n${ckDiffs.take(5).mkString("\n")}")
    }
    // sanity: parity is not vacuous — a one-character mutation moves it
    mutate(s"UPDATE $table SET ${profile.quote("s")} = 'MUTATED' " +
      s"WHERE ${profile.quote("k")} = 7")
    val mutated = eng.query(profile.checksumQuerySql(table, normalized)).head
    assert(BigDecimal(mutated(1).get.trim) != remoteSum)
  }

  test("300 random mixed-type rows checksum identically in Spark and live DuckDB") {
    val rows = mixedRows(20260812)
    val values = rows.map { case (k, d, x, s, ts, b, dt) =>
      Seq(
        k.toString,
        d.map(_.toPlainString).getOrElse("NULL"),
        x.map(_.toString).map(v => s"CAST($v AS DOUBLE)").getOrElse("NULL"),
        s.map(strLit).getOrElse("NULL"),
        ts.map(m => s"TIMESTAMP '${tsText(m)}'").getOrElse("NULL"),
        b.map(_.toString.toUpperCase).getOrElse("NULL"),
        dt.map(days => s"DATE '${dateText(days)}'").getOrElse("NULL")
      ).mkString("(", ", ", ")")
    }.mkString(", ")

    val eng = new ProcessEngine(
      Seq("python3", "-c", DuckDbProcess.BridgeScript), DuckDbProfile)
    try {
      eng.query("CREATE TABLE fuzz(k BIGINT, d DECIMAL(12,2), x DOUBLE, " +
        "s VARCHAR, ts TIMESTAMP, b BOOLEAN, dt DATE)")
      eng.query(s"INSERT INTO fuzz VALUES $values")
      assertChecksumParity(rows, eng, DuckDbProfile, "fuzz", sql => eng.query(sql))
    } finally eng.close()
  }

  test("the same seeded rows checksum identically in Spark and live embedded Derby") {
    // the SECOND live engine family: Derby's profile renders through
    // CHAR-casts, || concatenation, and the Java-backed bootstrap functions
    // — none of the DuckDB SQL surface — so agreement here pins the
    // normalization CONTRACT, not one engine's rendering quirks
    assume(scala.util.Try(Class.forName("org.apache.derby.jdbc.EmbeddedDriver")).isSuccess,
      "no Derby driver on the classpath")
    import graft.sources.{DerbyProfile, JdbcEngine}
    val rows = mixedRows(20260812) // SAME seed as the DuckDB run
    // doubles render in E-notation ("1.0E-9" stays approximate) or get E0
    // appended — Derby types a bare decimal literal as DECIMAL and its
    // decimal→double conversion would still be exact, but the explicit
    // approximate literal keeps the insert unambiguous
    def dblLit(v: Double): String = {
      val s = v.toString
      if (s.contains("E") || s.contains("e")) s else s + "E0"
    }
    val values = rows.map { case (k, d, x, s, ts, b, dt) =>
      Seq(
        k.toString,
        d.map(_.toPlainString).getOrElse("NULL"),
        x.map(dblLit).getOrElse("NULL"),
        s.map(strLit).getOrElse("NULL"),
        ts.map(m => s"TIMESTAMP('${tsText(m)}')").getOrElse("NULL"),
        b.map(_.toString.toUpperCase).getOrElse("NULL"),
        dt.map(days => s"DATE('${dateText(days)}')").getOrElse("NULL")
      ).mkString("(", ", ", ")")
    }.mkString(", ")

    val db = s"memory:graftfuzz${System.nanoTime()}"
    val setup = java.sql.DriverManager.getConnection(s"jdbc:derby:$db;create=true")
    val eng = new JdbcEngine(s"jdbc:derby:$db", new java.util.Properties(), DerbyProfile)
    try {
      def exec(sql: String): Unit = {
        val st = setup.createStatement()
        try st.executeUpdate(sql) finally st.close()
      }
      DerbyProfile.bootstrapSql.foreach(exec)
      // quoted lowercase columns: Derby folds unquoted identifiers to
      // UPPERCASE while the profile quotes the Spark-side (lowercase) names
      exec("""CREATE TABLE fuzz("k" BIGINT, "d" DECIMAL(12,2), "x" DOUBLE, """ +
        """"s" VARCHAR(100), "ts" TIMESTAMP, "b" BOOLEAN, "dt" DATE)""")
      exec(s"INSERT INTO fuzz VALUES $values")
      assertChecksumParity(rows, eng, DerbyProfile, "fuzz", exec)
    } finally {
      eng.close()
      setup.close()
      scala.util.Try(java.sql.DriverManager.getConnection(s"jdbc:derby:$db;drop=true"))
    }
  }
}

/** Four implementations, one truth: a seeded random mutation set applied to
  * a base table must come back EXACTLY — same keys, same signed rows — from
  * every differ in the engine: the single-pass outer join (JoinDiffer), the
  * bucket-pruning hashdiff, the local↔remote pushdown loop, and the
  * remote↔remote loop. Catches any divergence between the four control
  * flows that the per-differ specs (each with hand-picked mutations) could
  * miss.
  */
class DifferAgreementFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("random mutation set returned identically by all four differs") {
    import org.apache.spark.sql.functions._
    import graft.sources.{PushdownDiffer, RemoteTable, SparkViewEngine}
    val rnd = new scala.util.Random(424242)
    val base = (1L to 800L).map(i => (i, s"s$i", i * 3 % 101)).toDF("k", "s", "v")
    // random mutations: ~20 updates, ~10 deletes, ~10 inserts
    val updates = rnd.shuffle((1L to 800L).toList).take(20).toSet
    val deletes = rnd.shuffle((1L to 800L).filterNot(updates).toList).take(10).toSet
    val inserts = (801L to 810L).toSet
    val mutated = ((1L to 800L).filterNot(deletes)
      .map(i => (i, if (updates(i)) s"S$i!" else s"s$i", i * 3 % 101)) ++
      inserts.toSeq.map(i => (i, s"new$i", i % 7))).toDF("k", "s", "v")

    def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(col("sign"), col("k").cast("string"), col("s"),
        col("v").cast("string")).collect().map(_.mkString("|")).toSet
    val expected =
      updates.flatMap(i => Seq(s"-|$i|s$i|${i * 3 % 101}", s"+|$i|S$i!|${i * 3 % 101}")) ++
        deletes.map(i => s"-|$i|s$i|${i * 3 % 101}") ++
        inserts.map(i => s"+|$i|new$i|${i % 7}")

    val joined = canon(JoinDiffer.diff(base, mutated, Seq("k")))
    assert(joined == expected, "JoinDiffer diverged")
    val hashed = canon(HashDiffer.diff(
      TableSegment(base, Seq("k")), TableSegment(mutated, Seq("k")), buckets = 64))
    assert(hashed == expected, "HashDiffer diverged")

    base.createOrReplaceTempView("fz_a")
    mutated.createOrReplaceTempView("fz_b")
    val eng = new SparkViewEngine(spark)
    val pushed = canon(PushdownDiffer.diff(
      TableSegment(base, Seq("k")),
      RemoteTable.introspect(eng, "fz_b", Seq("k"), Seq("s", "v")),
      bisectionFactor = 4, bisectionThreshold = 64))
    assert(pushed == expected, "PushdownDiffer diverged")
    val rr = canon(graft.api.Graft.diffRemotes(spark, eng, "fz_a", eng, "fz_b",
      Seq("k"), Seq("s", "v"), bisectionFactor = 4, bisectionThreshold = 64))
    assert(rr == expected, "RemoteRemoteDiffer diverged")
    // fifth control flow: per-level progressive emission must union to the
    // SAME rows the batch loops return, on the same random mutations
    val progressive = canon(graft.sources.PushdownDiffer.diffWithStats(
      TableSegment(base, Seq("k")),
      RemoteTable.introspect(eng, "fz_b", Seq("k"), Seq("s", "v")),
      bisectionFactor = 4, bisectionThreshold = 64,
      control = new graft.sources.PushdownControl(progressive = true))._1)
    assert(progressive == expected, "progressive PushdownDiffer diverged")
    // sixth control flow: the default run above makes its own regime
    // decision (uniform random mutations dirty every top segment, so the
    // candidacy + sampled-children confirmation decide whether to cut
    // over); force pure bisection on the same mutations so BOTH possible
    // regimes are pinned to the same answer whatever the decision was
    val bisected = canon(graft.sources.PushdownDiffer.diffWithStats(
      TableSegment(base, Seq("k")),
      RemoteTable.introspect(eng, "fz_b", Seq("k"), Seq("s", "v")),
      bisectionFactor = 4, bisectionThreshold = 64,
      control = new graft.sources.PushdownControl(
        denseCutoverAfterLevels = Int.MaxValue))._1)
    assert(bisected == expected, "pure-bisection PushdownDiffer diverged")
  }

  test("compound-key mutation set agrees across all four differs") {
    import org.apache.spark.sql.functions._
    import graft.sources.{PushdownDiffer, RemoteTable, SparkViewEngine}
    val rnd = new scala.util.Random(31337)
    // (k1, k2) compound key with a negative dimension; k2 makes it unique
    val base = (1L to 600L).map(i => (i % 11 - 5, i, s"p$i")).toDF("k1", "k2", "p")
    val updates = rnd.shuffle((1L to 600L).toList).take(15).toSet
    val deletes = rnd.shuffle((1L to 600L).filterNot(updates).toList).take(8).toSet
    val mutated = (1L to 600L).filterNot(deletes)
      .map(i => (i % 11 - 5, i, if (updates(i)) s"P$i!" else s"p$i")).toDF("k1", "k2", "p")
    val expected =
      updates.flatMap(i => Seq(s"-|${i % 11 - 5}|$i|p$i", s"+|${i % 11 - 5}|$i|P$i!")) ++
        deletes.map(i => s"-|${i % 11 - 5}|$i|p$i")
    def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(col("sign"), col("k1").cast("string"), col("k2").cast("string"), col("p"))
        .collect().map(_.mkString("|")).toSet
    val keys = Seq("k1", "k2")
    assert(canon(JoinDiffer.diff(base, mutated, keys)) == expected, "JoinDiffer diverged")
    assert(canon(HashDiffer.diff(
      TableSegment(base, keys), TableSegment(mutated, keys), buckets = 32)) == expected,
      "HashDiffer diverged")
    base.createOrReplaceTempView("fzc_a")
    mutated.createOrReplaceTempView("fzc_b")
    val eng = new SparkViewEngine(spark)
    assert(canon(PushdownDiffer.diff(
      TableSegment(base, keys),
      RemoteTable.introspect(eng, "fzc_b", keys, Seq("p")),
      bisectionFactor = 9, bisectionThreshold = 48)) == expected, "PushdownDiffer diverged")
    assert(canon(graft.api.Graft.diffRemotes(spark, eng, "fzc_a", eng, "fzc_b",
      keys, Seq("p"), bisectionFactor = 9, bisectionThreshold = 48)) == expected,
      "RemoteRemoteDiffer diverged")
  }
}
