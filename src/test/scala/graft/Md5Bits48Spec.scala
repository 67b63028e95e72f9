package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HashUtils, Md5Bits48}

/** The custom codegen'd md5-48-bit expression must be bit-identical to the
  * built-in composition `conv(substring(md5(x), pos, 12), 16, 10)` it
  * replaces — any drift silently breaks checksum pruning AND every
  * dedup/minhash pipeline's cross-engine reproducibility. */
class Md5Bits48Spec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private val corpus: Seq[Option[String]] = Seq(
    Some(""), Some("a"), Some("hello world"), Some("<null>"),
    Some("héllo wörld ünïcode 中文 😀"),
    Some("line\nbreak\ttab|pipe'quote\"dquote\\backslash"),
    Some("x" * 10000), None) ++
    (0 until 256).map(i => Some(s"doc-$i-${i * 31}"))

  test("head48/tail48 match conv(substring(md5(x),...),16,10) on a corpus incl null/unicode/long") {
    val df = corpus.toDF("s")
    val rows = df.select(
      Md5Bits48.head(col("s")).as("h_new"),
      conv(substring(md5(col("s")), 1, 12), 16, 10).cast("long").as("h_old"),
      Md5Bits48.tail(col("s")).as("t_new"),
      conv(substring(md5(col("s")), 21, 12), 16, 10).cast("long").as("t_old")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1) && (r.isNullAt(0) || r.getLong(0) == r.getLong(1)),
        s"head mismatch: $r")
      assert(r.isNullAt(2) == r.isNullAt(3) && (r.isNullAt(2) || r.getLong(2) == r.getLong(3)),
        s"tail mismatch: $r")
    }
  }

  test("interpreted eval agrees with codegen (HashUtils static path)") {
    val bytes = "hello world".getBytes("UTF-8")
    // md5("hello world") = 5eb63bbbe01eeed093cb22bb8f5acdc3
    assert(HashUtils.md5Bits48(bytes, fromTail = false) == java.lang.Long.parseLong("5eb63bbbe01e", 16))
    assert(HashUtils.md5Bits48(bytes, fromTail = true) == java.lang.Long.parseLong("22bb8f5acdc3", 16))
  }

  test("values stay within [0, 2^48) so the checksum offset subtraction cannot overflow") {
    val mx = corpus.flatten.toDF("s")
      .select(greatest(max(Md5Bits48.head(col("s"))), max(Md5Bits48.tail(col("s")))))
      .head().getLong(0)
    assert(mx >= 0L && mx < (1L << 48))
  }

  test("GraftSparkExtensions injection tuples register and resolve in SQL") {
    // builder.withExtensions only affects sessions not yet constructed, so
    // drive the same injection tuples into an isolated child session's
    // registry (what the builder would do at construction time)
    val iso = spark.newSession()
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftSparkExtensions().apply(ext)
    org.apache.spark.sql.graft.ColumnBridge.registerInjectedFunctions(ext,
      iso.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry)
    val r = iso.sql(
      s"SELECT ${Md5Bits48.TailName}(cast('hello world' as binary)) AS t").head()
    assert(r.getLong(0) == java.lang.Long.parseLong("22bb8f5acdc3", 16))
    // the parent session's registry is untouched
    intercept[Exception] {
      spark.newSession(); spark.sql(s"SELECT ${Md5Bits48.TailName}_nope(NULL)").head()
    }
  }

  test("register() exposes both variants to spark.sql") {
    Md5Bits48.register(spark)
    val r = spark.sql(
      s"SELECT ${Md5Bits48.HeadName}(cast('hello world' as binary)) AS h, " +
        s"${Md5Bits48.TailName}(cast('hello world' as binary)) AS t").head()
    assert(r.getLong(0) == java.lang.Long.parseLong("5eb63bbbe01e", 16))
    assert(r.getLong(1) == java.lang.Long.parseLong("22bb8f5acdc3", 16))
  }

  test("binary input passes through unconverted; non-castable input fails analysis") {
    // binary column: hashes the raw bytes (same as md5(binary))
    val b = Seq(Array[Byte](1, 2, 3)).toDF("b")
      .select(Md5Bits48.tail(col("b")).as("t"),
        conv(substring(md5(col("b")), 21, 12), 16, 10).cast("long").as("t_old")).head()
    assert(b.getLong(0) == b.getLong(1))
    // a map column cannot cast to binary → analysis-time failure, not silent nulls
    val bad = Seq(1).toDF("x").select(map(col("x"), col("x")).as("m"))
    intercept[Exception] { bad.select(Md5Bits48.head(col("m"))).head() }
  }
}

class DotProductDoubleSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._
  import graft.sim.Similarity

  test("codegen'd dot is bit-identical to the fold spelling on random vectors") {
    val rnd = new scala.util.Random(17L)
    val rows = (0L until 200L).map { i =>
      val d = 1 + rnd.nextInt(16)
      (i, Array.fill(d)((rnd.nextDouble() * 4 - 2).toFloat),
        Array.fill(d)((rnd.nextDouble() * 4 - 2).toFloat))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
        Similarity.dot(col("a"), col("b")).as("fast"),
        Similarity.dotFold(col("a"), col("b")).as("ref"))
      .as[(Long, Double, Double)].collect()
    got.foreach { case (id, fast, ref) =>
      assert(java.lang.Double.doubleToLongBits(fast) ==
        java.lang.Double.doubleToLongBits(ref), s"id=$id $fast vs $ref")
    }
  }

  test("null semantics mirror the fold: null element or length mismatch -> null") {
    val df = Seq(
      (1L, Seq[Option[Double]](Some(1.0), None), Seq[Option[Double]](Some(2.0), Some(3.0))),
      (2L, Seq[Option[Double]](Some(1.0)), Seq[Option[Double]](Some(2.0), Some(3.0))),
      (3L, Seq[Option[Double]](Some(1.5), Some(-2.0)), Seq[Option[Double]](Some(2.0), Some(0.5))))
      .toDF("id", "a", "b")
    val got = df.select(col("id"),
        Similarity.dot(col("a"), col("b")).as("fast"),
        Similarity.dotFold(col("a"), col("b")).as("ref"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1), r.isNullAt(2),
        if (r.isNullAt(1)) 0.0 else r.getDouble(1)))
    got.foreach { case (id, fastNull, refNull, v) =>
      assert(fastNull == refNull, s"id=$id null mismatch")
      if (id == 3L) assert(!fastNull && v == 1.5 * 2.0 + -2.0 * 0.5)
    }
  }

  test("codegen'd rolling hash is bit-identical to the fold fingerprint") {
    val rnd = new scala.util.Random(31L)
    val ascii = (32 to 126).map(_.toChar)
    val latin = "éüñßàç"
    def text() = {
      val n = rnd.nextInt(120)
      (0 until n).map(_ =>
        if (rnd.nextInt(10) == 0) latin(rnd.nextInt(latin.length))
        else ascii(rnd.nextInt(ascii.length))).mkString
    }
    val rows = (0L until 150L).map(i => (i, text())) ++
      Seq((900L, ""), (901L, "a"), (902L, "hello world"),
        // 3-byte (CJK, ZWSP) and 4-byte (emoji, non-BMP) sequences: the
        // kernel walks UTF-8 bytes directly, so every length class must
        // agree with codePointAt iteration
        (903L, "漢字テスト​"), (904L, "a😀b🚀🧪"), (905L, "mixéd漢😀 end"))
    val df = rows.toDF("id", "t")
    val got = df.select(col("id"),
        graft.text.TextFunctions.fingerprint(col("t")).as("fast"),
        graft.text.TextFunctions.fingerprintFold(col("t")).as("ref"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (id, fast, ref) => assert(fast == ref, s"id=$id") }
  }

  test("graft_dot resolves in SQL via the extensions injection") {
    val iso = spark.newSession()
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftSparkExtensions().apply(ext)
    org.apache.spark.sql.graft.ColumnBridge.registerInjectedFunctions(ext,
      iso.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry)
    val r = iso.sql(
      s"SELECT ${graft.functions.DotProductDouble.Name}(" +
        "cast(array(1.0, 2.0) as array<double>), " +
        "cast(array(3.0, 4.0) as array<double>)) AS d").head()
    assert(r.getDouble(0) == 11.0)
  }
}

class TopKStructsSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._
  import graft.functions.TopKStructs

  test("bounded top-k matches the rank-window answer across shuffled partials") {
    // 40 partitions force partial buffers + serialize/merge between stages
    val rnd = new scala.util.Random(7)
    val rows = (1L to 2000L).map(i => (s"g${i % 7}", i, rnd.nextInt(100)))
    val df = rows.toDF("g", "id", "score").repartition(40)
    val got = df.groupBy("g")
      .agg(TopKStructs.topK(struct((-col("score")).as("neg"), col("id").as("id")), 5).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "r")))
      .select(col("g"), col("r.id").as("id"), (col("pos") + 1).as("rnk"))
      .as[(String, Long, Int)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val want = df.withColumn("rnk", row_number().over(w)).where(col("rnk") <= 5)
      .select(col("g"), col("id"), col("rnk"))
      .as[(String, Long, Int)].collect().toSet
    assert(got == want)
  }

  test("k larger than the group returns the whole group, ascending") {
    val df = Seq(("a", 3L), ("a", 1L), ("b", 2L)).toDF("g", "v")
    val got = df.groupBy("g")
      .agg(TopKStructs.topK(struct(col("v")), 10).as("top"))
      .select(col("g"), col("top.v").as("vs"))
      .as[(String, Seq[Long])].collect().toMap
    assert(got("a") == Seq(1L, 3L) && got("b") == Seq(2L))
  }

  test("null structs are skipped; duplicate values all kept up to k") {
    val df = Seq(Some(5L), None, Some(5L), Some(1L), Some(5L))
      .toDF("v").withColumn("g", lit("x"))
    val got = df.groupBy("g")
      .agg(TopKStructs.topK(when(col("v").isNotNull, struct(col("v"))), 3).as("top"))
      .select(col("top.v").as("vs")).as[Seq[Long]].head()
    assert(got == Seq(1L, 5L, 5L))
  }
}
