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

  test("300 random mixed-type rows checksum identically in Spark and live DuckDB") {
    val rnd = new scala.util.Random(20260812)
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

    val rows = (1L to 300L).map { k =>
      (k, opt(randDec()), opt(randDouble()), opt(randString()),
        opt(randMicros()), opt(rnd.nextBoolean()), opt(rnd.between(0, 24000))) // dates 1970..~2035
    }

    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("d", DecimalType(12, 2)),
      StructField("x", DoubleType),
      StructField("s", StringType),
      StructField("ts", TimestampType),
      StructField("b", BooleanType),
      StructField("dt", DateType)))
    val sparkRows = rows.map { case (k, d, x, s, ts, b, dt) =>
      Row(k, d.orNull, x.map(Double.box).orNull, s.orNull,
        ts.map(m => java.sql.Timestamp.from(Instant.ofEpochSecond(m / 1000000L, (m % 1000000L) * 1000L))).orNull,
        b.map(Boolean.box).orNull,
        dt.map(days => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.toLong))).orNull)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(sparkRows, 4), schema)

    def lit(v: Any): String = v match {
      case null => "NULL"
      case s: String => "'" + s.replace("'", "''") + "'"
      case other => other.toString
    }
    val values = rows.map { case (k, d, x, s, ts, b, dt) =>
      Seq(
        k.toString,
        d.map(_.toPlainString).getOrElse("NULL"),
        x.map(_.toString).map(v => s"CAST($v AS DOUBLE)").getOrElse("NULL"),
        s.map(v => lit(v)).getOrElse("NULL"),
        ts.map(m => "TIMESTAMP '" + TsFmt.format(Instant.ofEpochSecond(m / 1000000L, (m % 1000000L) * 1000L)) + "'").getOrElse("NULL"),
        b.map(_.toString.toUpperCase).getOrElse("NULL"),
        dt.map(days => "DATE '" + java.time.LocalDate.ofEpochDay(days.toLong) + "'").getOrElse("NULL")
      ).mkString("(", ", ", ")")
    }.mkString(", ")

    val eng = new ProcessEngine(
      Seq("python3", "-c", DuckDbProcess.BridgeScript), DuckDbProfile)
    try {
      eng.query("CREATE TABLE fuzz(k BIGINT, d DECIMAL(12,2), x DOUBLE, " +
        "s VARCHAR, ts TIMESTAMP, b BOOLEAN, dt DATE)")
      eng.query(s"INSERT INTO fuzz VALUES $values")
      val normalized = schema.fields.map(f =>
        DuckDbProfile.normalizedColumnSql(f.name, f.dataType))
      val remote = eng.query(
        DuckDbProfile.checksumQuerySql("fuzz", normalized.toIndexedSeq)).head
      val (remoteCnt, remoteSum) =
        (remote(0).get.toLong, BigDecimal(remote(1).get))

      val (localCnt, localSum) = TableSegment(df, Seq("k")).countAndChecksum()
      assert(localCnt == remoteCnt)
      assert(localSum.contains(remoteSum),
        s"checksum mismatch: spark=$localSum duckdb=$remoteSum")

      // sanity: parity is not vacuous — a one-character mutation moves it
      eng.query("UPDATE fuzz SET s = 'MUTATED' WHERE k = 7")
      val mutated = eng.query(
        DuckDbProfile.checksumQuerySql("fuzz", normalized.toIndexedSeq)).head
      assert(BigDecimal(mutated(1).get) != remoteSum)
    } finally eng.close()
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
