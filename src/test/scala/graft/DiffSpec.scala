package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.diff._

object SparkTest {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class ChecksumSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("golden: md5('hello world') 12-hex suffix minus offset (reference tests/common.py:117-127)") {
    // md5("hello world") = 5eb63bbbe01eeed093cb22bb8f5acdc3; last 12 hex
    // digits "22bb8f5acdc3" = 38188959321539. (The reference comment's
    // 273350391345368515 constant predates CHECKSUM_HEXDIGITS=12 — the
    // str_to_checksum code computes md5[20:] as below.)
    val got = Seq("hello world").toDF("s")
      .select(Checksum.rowChecksum(Seq(col("s"))).as("c")).head().getLong(0)
    assert(got == 38188959321539L - Checksum.Offset)
  }

  test("null column hashes as the '<null>' sentinel") {
    val withNull = Seq((1, Option.empty[String])).toDF("k", "v")
      .select(Checksum.rowChecksum(Seq(col("k").cast("string"), col("v")))).head().getLong(0)
    val sentinel = Seq((1, "<null>")).toDF("k", "v")
      .select(Checksum.rowChecksum(Seq(col("k").cast("string"), col("v")))).head().getLong(0)
    assert(withNull == sentinel)
  }

  test("100-column wide row checksums (reference tests/test_postgresql.py wide table)") {
    // Guards the concat_ws/md5 pipeline against codegen width limits: a
    // 100-column normalized concat must neither fail nor silently fall
    // back to wrong results. Golden value = md5 of the joined string.
    val wide = spark.range(1).select(
      (0 until 100).map(i => lit(s"v$i").as(s"c$i")): _*)
    val cols = (0 until 100).map(i => col(s"c$i"))
    val got = wide.select(Checksum.rowChecksum(cols).as("c")).head().getLong(0)
    val joined = (0 until 100).map(i => s"v$i").mkString("|")
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest(joined.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = java.lang.Long.parseLong(md5hex.substring(20), 16) - Checksum.Offset
    assert(got == expected)
  }
}

class NormalizeSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("canonical forms: timestamp, fraction, boolean, integer") {
    val df = Seq((java.sql.Timestamp.valueOf("2022-06-03 12:24:35"), 1.5, true, 42L))
      .toDF("ts", "d", "b", "i")
    val row = df.select(
      Normalize.normalize(col("ts"), org.apache.spark.sql.types.TimestampType),
      Normalize.normalize(col("d"), org.apache.spark.sql.types.DoubleType),
      Normalize.normalize(col("b"), org.apache.spark.sql.types.BooleanType),
      Normalize.normalize(col("i"), org.apache.spark.sql.types.LongType)).head()
    assert(row.getString(0) == "2022-06-03 12:24:35.000000")
    assert(row.getString(1) == "1.50")
    assert(row.getString(2) == "1")
    assert(row.getString(3) == "42")
  }

  test("NaN and infinities normalize to distinct literals, never NULL-colliding") {
    // the bare decimal cast rendered these as NULL — a NaN on one side
    // checksummed EQUAL to a genuine NULL on the other and the segment
    // pruned clean
    val df = Seq((Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      Option.empty[java.lang.Double])).toDF("nan", "pinf", "ninf", "nul")
    val r = df.select(
      Normalize.normalize(col("nan"), org.apache.spark.sql.types.DoubleType),
      Normalize.normalize(col("pinf"), org.apache.spark.sql.types.DoubleType),
      Normalize.normalize(col("ninf"), org.apache.spark.sql.types.DoubleType),
      Normalize.normalize(col("nul"), org.apache.spark.sql.types.DoubleType)).head()
    assert(r.getString(0) == "NaN" && r.getString(1) == "Infinity" &&
      r.getString(2) == "-Infinity" && r.isNullAt(3))
  }

  test("normalizedCols resolves column casing like the session (JDBC uppercased schemas)") {
    val df = Seq((1L, "x")).toDF("ID", "V")
    val cols = Normalize.normalizedCols(df.schema, Seq("id", "v"))
    // must not throw, and must normalize through the stored field's type
    assert(df.select(cols: _*).head().getString(0) == "1")
  }

  test("a declared non-ordinal collation with unknown locale facts is NOT binary-equivalent") {
    import graft.sources.Collation
    val v = Collation.negotiate(Collation.SparkBinary, Collation(ordinal = Some(false)))
    assert(v != Right(None),
      s"non-ordinal must not pass as ordinal-equivalent (raw segmentation unsafe): $v")
  }
}

class JsonCompareSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("key order and whitespace do not make JSONs differ; values do") {
    val df = Seq(
      ("""{"b": 1, "a": 2}""", """{"a":2,"b":1}""", true),
      ("""{"k": 1}""", """{ "k" : 1 }""", true),
      ("""{"k": 1}""", """{"k": 2}""", false),
      (null.asInstanceOf[String], null.asInstanceOf[String], true)
    ).toDF("a", "b", "want")
    val got = df.select(JsonCompare.jsonEquivalent(col("a"), col("b")).as("eq"), col("want"))
      .collect()
    got.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1), r.toString))
  }

  test("types are preserved, numbers compare by value, duplicate keys don't crash") {
    val df = Seq(
      // a number and its string rendering are DIFFERENT values — the old
      // Map(String,String) canonicalization stringified both and
      // silently suppressed the diff
      ("""{"a":1}""", """{"a":"1"}""", false),
      ("""{"a":true}""", """{"a":"true"}""", false),
      // reference compares json.loads values: 1 == 1.0
      ("""{"a":1.0}""", """{"a":1}""", true),
      ("""{"a":1E2}""", """{"a":100}""", true),
      // nested reordering is equivalence too (recursive canonical keys)
      ("""{"a":{"y":2,"x":1}}""", """{"a":{"x":1,"y":2}}""", true),
      // duplicate keys: legal JSON, last-wins, never a job abort
      ("""{"a":1,"a":2}""", """{"a":2}""", true),
      ("""{"a":1,"a":2}""", """{"a":1}""", false)
    ).toDF("a", "b", "want")
    val got = df.select(JsonCompare.jsonEquivalent(col("a"), col("b")).as("eq"), col("want"))
      .collect()
    got.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1), r.toString))
  }
}

class JoinDifferSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def sides = {
    val a = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).toDF("k", "s", "v")
    val b = Seq((2L, "b", 2.0), (3L, "x", 3.0), (4L, "d", 4.0)).toDF("k", "s", "v")
    (a, b)
  }

  test("emits -/+ for removed, updated (both signs), added; skips unchanged") {
    val (a, b) = sides
    val got = JoinDiffer.diff(a, b, Seq("k"))
      .select("sign", "k", "s").as[(String, Long, String)].collect().toSet
    assert(got == Set(("-", 1L, "a"), ("-", 3L, "c"), ("+", 3L, "x"), ("+", 4L, "d")))
  }

  test("stats: removed/added/updated/unchanged") {
    val (a, b) = sides
    val r = JoinDiffer.stats(a, b, Seq("k")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((1L, 1L, 1L, 1L)))
  }

  test("epsilon tolerance: drift within eps is unchanged, beyond diffs, nulls stay strict") {
    val a = Seq((1L, Some(10.0), "p"), (2L, Some(20.0), "q"),
      (3L, Some(30.0), "r"), (4L, None: Option[Double], "s"),
      (5L, Some(50.0), "t")).toDF("k", "v", "s")
    val b = Seq((1L, Some(10.005), "p"), (2L, Some(20.5), "q"),
      (3L, None: Option[Double], "r"), (4L, None: Option[Double], "s"),
      (5L, Some(50.0), "u")).toDF("k", "v", "s")
    val tol = Map("v" -> 0.01)
    val got = JoinDiffer.diff(a, b, Seq("k"), tolerances = tol)
      .select("sign", "k").as[(String, Long)].collect().toSet
    // k=1 within eps → unchanged; k=2 beyond eps; k=3 null vs value is a
    // diff regardless of eps; k=4 null<=>null unchanged; k=5 the UNMAPPED
    // string column stays byte-exact
    assert(got == Set(("-", 2L), ("+", 2L), ("-", 3L), ("+", 3L),
      ("-", 5L), ("+", 5L)))
    val r = JoinDiffer.stats(a, b, Seq("k"), tolerances = tol).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((0L, 0L, 3L, 2L)))
    // NaN: equal to itself via the null-safe branch, a diff vs any number
    val na = Seq((1L, Double.NaN), (2L, Double.NaN)).toDF("k", "v")
    val nb = Seq((1L, Double.NaN), (2L, 2.0)).toDF("k", "v")
    val nd = JoinDiffer.diff(na, nb, Seq("k"), tolerances = tol)
      .select("k").as[Long].collect().toSet
    assert(nd == Set(2L))
    // refusal: a negative or NaN epsilon is a caller bug, not a knob
    intercept[IllegalArgumentException] {
      JoinDiffer.diff(a, b, Seq("k"), tolerances = Map("v" -> -0.5))
    }
  }

  test("tolerance guards: infinities diff, non-numeric falls back exact, typos refuse") {
    // Inf vs number must DIFF under rtol (the bound would be Inf <= Inf
    // without the finiteness guard); Inf <=> Inf stays unchanged
    val ia = Seq((1L, Double.PositiveInfinity), (2L, Double.PositiveInfinity))
      .toDF("k", "v")
    val ib = Seq((1L, 42.0), (2L, Double.PositiveInfinity)).toDF("k", "v")
    val id = JoinDiffer.diff(ia, ib, Seq("k"), relTolerances = Map("v" -> 0.5))
      .select("k").as[Long].collect().toSet
    assert(id == Set(1L))
    // a tolerance on a STRING column: the double cast can't evaluate, the
    // envelope must fall back to the exact compare instead of
    // NULL-propagating the row out of the diff entirely
    val sa = Seq((1L, "p"), (2L, "same")).toDF("k", "v")
    val sb = Seq((1L, "q"), (2L, "same")).toDF("k", "v")
    val sd = JoinDiffer.diff(sa, sb, Seq("k"), tolerances = Map("v" -> 0.01))
      .select("k").as[Long].collect().toSet
    assert(sd == Set(1L), "non-castable tolerant column must still report diffs")
    // an infinite epsilon would disable the column compare silently
    intercept[IllegalArgumentException] {
      JoinDiffer.diff(sa, sb, Seq("k"),
        tolerances = Map("v" -> Double.PositiveInfinity))
    }
    // the API layer refuses a tolerance key that names no compare column
    import graft.api.Graft
    val e = intercept[IllegalArgumentException] {
      Graft.diffTables(
        graft.diff.TableSegment(sa, Seq("k")), graft.diff.TableSegment(sb, Seq("k")),
        Graft.DiffOptions(tolerances = Map("nope" -> 0.01)))
    }
    assert(e.getMessage.contains("nope"))
    // …but a wrong-CASE key resolves like the columns themselves do
    val ok = Graft.diffTables(
      graft.diff.TableSegment(ia, Seq("k")), graft.diff.TableSegment(ib, Seq("k")),
      Graft.DiffOptions(tolerances = Map("V" -> 100.0)))
    assert(ok.select("k").as[Long].collect().toSet == Set(1L)) // Inf still diffs
  }

  test("relative tolerance scales with magnitude; atol covers the near-zero hole") {
    // same proportional drift (×1.0001) on a small and a huge value: a
    // fixed atol passes one and fails the other, rtol passes both
    val a = Seq((1L, 10.0), (2L, 1.0e9), (3L, 0.0)).toDF("k", "v")
    val b = Seq((1L, 10.0 * 1.0001), (2L, 1.0e9 * 1.0001), (3L, 1.0e-9)).toDF("k", "v")
    val byRel = JoinDiffer.diff(a, b, Seq("k"),
      relTolerances = Map("v" -> 0.001))
      .select("k").as[Long].collect().toSet
    // k=1, k=2 proportional drift suppressed; k=3 is the documented
    // rel-only pitfall — |0 − 1e-9| > rtol·max(0, 1e-9), so it DIFFS
    assert(byRel == Set(3L))
    // the combined isclose envelope: a tiny atol absorbs the near-zero
    // noise while rtol still owns the magnitude-scaled part
    val byBoth = JoinDiffer.diff(a, b, Seq("k"),
      tolerances = Map("v" -> 1.0e-6), relTolerances = Map("v" -> 0.001))
    assert(byBoth.isEmpty)
    // and stats agree with the row-level diff
    val r = JoinDiffer.stats(a, b, Seq("k"),
      tolerances = Map("v" -> 1.0e-6), relTolerances = Map("v" -> 0.001)).head()
    assert((r.getLong(2), r.getLong(3)) == ((0L, 3L)))
  }

  test("membership-only diff: key-only tables and all-columns-ignored both work") {
    // key-only link table — anyDiff over zero compare columns must not
    // crash (empty.reduceLeft), and exclusives still report
    val la = Seq(Tuple1(1L), Tuple1(2L)).toDF("k")
    val lb = Seq(Tuple1(2L), Tuple1(3L)).toDF("k")
    val got = JoinDiffer.diff(la, lb, Seq("k"))
      .select("sign", "k").as[(String, Long)].collect().toSet
    assert(got == Set(("-", 1L), ("+", 3L)))
    // ignoreColumns covering EVERY compare column must not silently
    // re-derive them (the Nil-means-all sentinel): k=3's s/v change is
    // ignored, only membership diffs remain
    val (a, b) = sides
    val viaApi = graft.api.Graft.diffTables(
      graft.diff.TableSegment(a, Seq("k")), graft.diff.TableSegment(b, Seq("k")),
      graft.api.Graft.DiffOptions(ignoreColumns = Seq("s", "v")))
      .select("sign", "k").as[(String, Long)].collect().toSet
    assert(viaApi == Set(("-", 1L), ("+", 4L)), s"ignored columns leaked back in: $viaApi")
  }

  test("stats report zeros, not NULLs, on an empty join; jsonCols agree with diff") {
    val e = Seq.empty[(Long, String)].toDF("k", "v")
    val r = JoinDiffer.stats(e, e, Seq("k")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((0L, 0L, 0L, 0L)))
    // cosmetic JSON reordering: diff() with jsonCols emits nothing — the
    // stats summary must agree instead of counting them updated
    val ja = Seq((1L, """{"x":1,"y":2}""")).toDF("k", "j")
    val jb = Seq((1L, """{"y":2,"x":1}""")).toDF("k", "j")
    val s = JoinDiffer.stats(ja, jb, Seq("k"), jsonCols = Set("j")).head()
    assert(s.getLong(2) == 0L && s.getLong(3) == 1L, s.toString)
    val c = JoinDiffer.diffCountsPerColumn(ja, jb, Seq("k"), Seq("j"), Set("j")).head()
    assert(c.getLong(0) == 0L, c.toString)
  }

  test("sampleExclusive returns only one-sided rows with original columns") {
    val (a, b) = sides
    val removed = JoinDiffer.sampleExclusive(a, b, Seq("k"), "a", n = 10)
      .select("k", "s").as[(Long, String)].collect().toSet
    val added = JoinDiffer.sampleExclusive(a, b, Seq("k"), "b", n = 10)
      .select("k", "s").as[(Long, String)].collect().toSet
    assert(removed == Set((1L, "a"))) // only in a
    assert(added == Set((4L, "d")))   // only in b
  }

  test("hashdiff catches a value migrating between columns via nulls") {
    // xxhash64 skips nulls — without per-column null flags these rows
    // would collide and the diff would be silently pruned
    val a = Seq((1L, Option("x"), Option.empty[String])).toDF("k", "c1", "c2")
    val b = Seq((1L, Option.empty[String], Option("x"))).toDF("k", "c1", "c2")
    val d = graft.diff.HashDiffer.diff(
      graft.diff.TableSegment(a, Seq("k")), graft.diff.TableSegment(b, Seq("k")), buckets = 4)
    assert(d.count() == 2) // '-' old + '+' new
  }

  test("json equivalence: null vs malformed vs nested payloads are not conflated") {
    import org.apache.spark.sql.functions.col
    val eq = (x: Option[String], y: Option[String]) =>
      Seq((x, y)).toDF("a", "b")
        .select(graft.diff.JsonCompare.jsonEquivalent(col("a"), col("b"))).head().getBoolean(0)
    assert(!eq(None, Some("not-json")))                      // null vs garbage
    assert(!eq(Some("""{"a":{"x":1}}"""), Some("""{"a":{"x":2}}"""))) // different nested
    assert(eq(Some("""{"a":{"x":1}}"""), Some("""{"a":{"x":1}}"""))) // identical nested (raw)
    assert(eq(None, None))                                   // both absent
    assert(eq(Some("""{"x":"1","y":"2"}"""), Some("""{"y":"2","x":"1"}"""))) // reordered flat
  }

  test("null-safe compare: null vs null is not a diff") {
    val a = Seq((1L, Option.empty[String])).toDF("k", "s")
    val b = Seq((1L, Option.empty[String])).toDF("k", "s")
    assert(JoinDiffer.diff(a, b, Seq("k")).count() == 0)
    val b2 = Seq((1L, Option("x"))).toDF("k", "s")
    assert(JoinDiffer.diff(a, b2, Seq("k")).count() == 2)
  }

  test("compound keys") {
    val a = Seq((1L, 1, "a"), (1L, 2, "b")).toDF("k1", "k2", "s")
    val b = Seq((1L, 1, "a"), (1L, 2, "B")).toDF("k1", "k2", "s")
    val got = JoinDiffer.diff(a, b, Seq("k1", "k2"))
      .select("sign", "k2").as[(String, Int)].collect().toSet
    assert(got == Set(("-", 2), ("+", 2)))
  }

  test("applyDiff patches b back into a: deletes added, inserts removed, replaces updated") {
    val (a, b) = sides
    val patched = JoinDiffer.applyDiff(b, JoinDiffer.diff(a, b, Seq("k")), Seq("k"))
    assert(patched.as[(Long, String, Double)].collect().toSet ==
      a.as[(Long, String, Double)].collect().toSet)
    // and the fixpoint: a patched with an empty diff is a
    val noop = JoinDiffer.applyDiff(a, JoinDiffer.diff(a, a, Seq("k")), Seq("k"))
    assert(noop.as[(Long, String, Double)].collect().toSet ==
      a.as[(Long, String, Double)].collect().toSet)
  }

  test("applyDiff reconciles seeded-random mutations (fuzz)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val n = 50 + rnd.nextInt(100)
      val aRows = (1 to n).map(i => (i.toLong, rnd.nextInt(10).toString, rnd.nextDouble()))
      // mutate: drop ~20%, change ~20%, add ~20% new keys
      val bRows = aRows.filter(_ => rnd.nextDouble() > 0.2).map {
        case (k, s, v) if rnd.nextDouble() < 0.2 => (k, s + "!", v + 1.0)
        case r => r
      } ++ (1 to n / 5).map(i => ((n + i).toLong, "new", rnd.nextDouble()))
      val a = aRows.toDF("k", "s", "v")
      val b = bRows.toDF("k", "s", "v")
      val patched = JoinDiffer.applyDiff(b, JoinDiffer.diff(a, b, Seq("k")), Seq("k"))
      assert(patched.as[(Long, String, Double)].collect().toSet == aRows.toSet)
    }
  }
}

class HashDifferSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("identical sides prune every bucket: zero dirty buckets, empty diff") {
    val a = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
    val segA = TableSegment(a, Seq("k"))
    val segB = TableSegment(a, Seq("k"))
    assert(HashDiffer.dirtyBuckets(segA, segB, 16).isEmpty)
    assert(HashDiffer.diff(segA, segB, 16).count() == 0)
  }

  test("matches JoinDiffer on a mutated side") {
    val a = (1L to 200L).map(i => (i, s"v$i")).toDF("k", "s")
    val b = (1L to 200L).filter(_ % 50 != 0).map(i => (i, if (i % 30 == 0) "X" else s"v$i")).toDF("k", "s")
    val viaHash = HashDiffer.diff(TableSegment(a, Seq("k")), TableSegment(b, Seq("k")), 16)
      .select("sign", "k", "s").as[(String, Long, String)].collect().toSet
    val viaJoin = JoinDiffer.diff(a, b, Seq("k"))
      .select("sign", "k", "s").as[(String, Long, String)].collect().toSet
    assert(viaHash == viaJoin && viaHash.nonEmpty)
  }

  test("default buckets auto-size from a cheap count via the reference clamp") {
    // the heuristic itself: one bucket per ~250k rows, clamped [2, 128]
    // (reference: tests/test_database_types.py:744-745)
    assert(HashDiffer.autoBuckets(0L) == 2)
    assert(HashDiffer.autoBuckets(250000L) == 2)
    assert(HashDiffer.autoBuckets(1000000L) == 4)
    assert(HashDiffer.autoBuckets(100000000L) == 128)
    // the default-auto path (buckets omitted) produces the same rows as
    // an explicit level size, sized from the LARGER side
    val a = (1L to 300L).map(i => (i, s"v$i")).toDF("k", "s")
    val b = (1L to 300L).map(i => (i, if (i % 100 == 0) "X" else s"v$i")).toDF("k", "s")
    val auto = HashDiffer.diff(TableSegment(a, Seq("k")), TableSegment(b, Seq("k")))
      .select("sign", "k").as[(String, Long)].collect().toSet
    val explicit = HashDiffer.diff(TableSegment(a, Seq("k")), TableSegment(b, Seq("k")), 16)
      .select("sign", "k").as[(String, Long)].collect().toSet
    assert(auto == explicit && auto.size == 6)
    // the API default rides the same sentinel
    assert(graft.api.Graft.DiffOptions().buckets == HashDiffer.Auto)
  }

  test("two-level refinement matches single-level and JoinDiffer") {
    import spark.implicits._
    val a = (1L to 400L).map(i => (i, s"v$i")).toDF("k", "s")
    val b = (1L to 400L).map(i => (i, if (i == 123L) "CHANGED" else s"v$i")).toDF("k", "s")
    val segA = TableSegment(a, Seq("k"))
    val segB = TableSegment(b, Seq("k"))
    val coarse = HashDiffer.dirtyBuckets(segA, segB, 8)
    assert(coarse.length == 1) // one mutated row → one dirty coarse bucket
    val refined = HashDiffer.diff(segA, segB, buckets = 8, refineFactor = 16)
      .select("sign", "k").as[(String, Long)].collect().toSet
    assert(refined == Set(("-", 123L), ("+", 123L)))
    assert(refined == HashDiffer.diff(segA, segB, buckets = 8)
      .select("sign", "k").as[(String, Long)].collect().toSet)
  }

  test("Auto refine: engages only past the leaf threshold, sized to the reference leaf") {
    // driver arithmetic: below RefineLeaf rows no second level; above it,
    // fine cells target ~250k rows; the fine-cell count stays bounded
    assert(HashDiffer.autoRefineFactor(HashDiffer.RefineLeaf, 4, 128) == 1)
    assert(HashDiffer.autoRefineFactor(HashDiffer.RefineLeaf + 1, 1, 128) == 5)
    assert(HashDiffer.autoRefineFactor(10000000L, 2, 128) == 20)
    assert(HashDiffer.autoRefineFactor(1000000000L, 1, 128) == 512) // capped
    assert(HashDiffer.autoRefineFactor(2000000L, 8, 2) == 1) // already fine
    // end-to-end: a 2.4M-row pair with 3 mutated keys — at 2 coarse
    // buckets EVERY dirty bucket holds ~1.2M rows > RefineLeaf, so the
    // threshold crosses regardless of which buckets the keys hash into —
    // and the auto path must agree with refine-disabled exactly (same
    // rows, just a smaller final exchange)
    import spark.implicits._
    val base = spark.range(1, 2400001).select(col("id").as("k"),
      (col("id") % 1000).as("v"))
    val mut = base.withColumn("v",
      when(col("k").isin(700L, 700000L, 1400000L), lit(-1L))
        .otherwise(col("v")))
    val segA = TableSegment(base, Seq("k"))
    val segB = TableSegment(mut, Seq("k"))
    val autoDf = HashDiffer.diff(segA, segB, buckets = 2)
    val auto = autoDf
      .select("sign", "k").as[(String, Long)].collect().toSet
    val plain = HashDiffer.diff(segA, segB, buckets = 2, refineFactor = 1)
      .select("sign", "k").as[(String, Long)].collect().toSet
    assert(auto == plain)
    assert(auto == Set(700L, 700000L, 1400000L)
      .flatMap(k => Set(("-", k), ("+", k))))
    // AT-SCALE ENGAGEMENT EVIDENCE (r19 verdict #5): prove the second
    // level actually fired inside diff() and that it shrank the final
    // exchange, not just that results agree.
    // (1) replay the driver decision from the real level-1 summaries
    val dirty = HashDiffer.bucketSummaries(segA, segB, 2)
      .where(col("is_dirty"))
      .select(col("bucket"),
        greatest(coalesce(col("a_cnt"), lit(0L)),
          coalesce(col("b_cnt"), lit(0L))).as("n")).collect()
    val rf = HashDiffer.autoRefineFactor(
      dirty.map(_.getLong(1)).sum, dirty.length, 2)
    assert(rf > 1, s"fixture no longer crosses RefineLeaf: rf=$rf")
    val fine = 2 * rf
    // (2) the auto plan carries the FINE bucket filter (pmod … fine) the
    // refine-disabled plan lacks — the in-plan witness that level 2 ran
    def pmodFilters(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.toString.contains("pmod") => f.condition.toString
      }
    assert(pmodFilters(autoDf).exists(_.contains(s", $fine)")),
      s"no fine-level (pmod % $fine) filter in the auto plan:\n" +
        pmodFilters(autoDf).mkString("\n"))
    // (3) the final exchange shrinks ~by the refine factor: rows passing
    // coarse+fine filters vs coarse-only (the refine-disabled join input)
    val dirtyCoarse = dirty.map(_.getLong(0)).toSeq
    val coarseRows = segB.withExtraFilter(
      HashDiffer.bucketOf(Seq("k"), 2).isin(dirtyCoarse: _*)).scoped.count()
    val dirtyFine = HashDiffer.dirtyBuckets(
      segA.withExtraFilter(HashDiffer.bucketOf(Seq("k"), 2).isin(dirtyCoarse: _*)),
      segB.withExtraFilter(HashDiffer.bucketOf(Seq("k"), 2).isin(dirtyCoarse: _*)),
      fine)
    val fineRows = segB.withExtraFilter(
        HashDiffer.bucketOf(Seq("k"), 2).isin(dirtyCoarse: _*))
      .withExtraFilter(HashDiffer.bucketOf(Seq("k"), fine).isin(dirtyFine.toSeq: _*))
      .scoped.count()
    assert(fineRows * 2 <= coarseRows,
      s"refine did not shrink the join input: $coarseRows -> $fineRows (rf=$rf)")
  }

  test("segment scoping: key bounds filter rows (product order)") {
    val a = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "s")
    val seg = TableSegment(a, Seq("k")).withScope(Seq(10L), Seq(20L))
    assert(seg.scoped.count() == 10) // [10, 20)
    val (cnt, cs) = seg.countAndChecksum()
    assert(cnt == 10 && cs.isDefined)
  }

  test("validateKeys flags duplicates and nulls") {
    val a = Seq(Some(1L), Some(1L), Some(2L), None).toDF("k")
    val (total, distinct, nulls) = TableSegment(a, Seq("k")).validateKeys()
    assert(total == 4 && distinct == 2 && nulls == 1)
  }
}

class SnapshotChecksumsSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def seg(df: org.apache.spark.sql.DataFrame) = TableSegment(df, Seq("k"))

  test("unchanged snapshot compares clean; mutations localize to their buckets") {
    val dir = java.nio.file.Files.createTempDirectory("snap").toString
    val v1 = (1L to 500L).map(i => (i, s"v$i")).toDF("k", "v")
    SnapshotChecksums.save(seg(v1), s"$dir/sums", buckets = 64)

    // identical data → nothing dirty
    val clean = SnapshotChecksums.compare(seg(v1), spark, s"$dir/sums")
    assert(clean.where(col("is_dirty")).count() == 0)

    // update k=42, delete k=100, insert k=501
    val v2 = ((1L to 500L).filter(_ != 100L).map(i =>
      (i, if (i == 42L) "CHANGED" else s"v$i")) :+ (501L, "v501")).toDF("k", "v")
    val cmp = SnapshotChecksums.compare(seg(v2), spark, s"$dir/sums")
    val dirty = cmp.where(col("is_dirty")).select("bucket").as[Long].collect().toSet
    val expected = Seq(42L, 100L, 501L).map(k =>
      Seq(Tuple1(k)).toDF("k").select(HashDiffer.bucketOf(Seq("k"), 64)).head().getLong(0)).toSet
    assert(dirty == expected)
    // count drift visible where rows appeared/vanished
    val drift = cmp.where(!(col("old_cnt") <=> col("new_cnt"))).count()
    assert(drift == Seq(100L, 501L).map(k =>
      Seq(Tuple1(k)).toDF("k").select(HashDiffer.bucketOf(Seq("k"), 64)).head().getLong(0)).toSet.size)

    // dirtyScope re-reads only changed regions: every mutated key is in
    // scope, and scope stays a small fraction of the table
    val scoped = SnapshotChecksums.dirtyScope(seg(v2), spark, s"$dir/sums").scoped
    val keys = scoped.select("k").as[Long].collect().toSet
    assert(keys.contains(42L) && keys.contains(501L) && !keys.contains(100L))
    assert(keys.size < 100) // ~3/64 of the key space, not the whole table
  }

  test("parity mode stores the cross-engine md5 checksum form") {
    val dir = java.nio.file.Files.createTempDirectory("snapp").toString
    val df = (1L to 50L).map(i => (i, s"v$i")).toDF("k", "v")
    SnapshotChecksums.save(seg(df), s"$dir/sums", buckets = 8, parity = true)
    val stored = spark.read.parquet(s"$dir/sums")
    // parity checksums are the md5-based DECIMAL(38,0) sums, not xxhash64 longs
    assert(stored.schema("checksum").dataType.typeName.startsWith("decimal"))
    assert(SnapshotChecksums.compare(seg(df), spark, s"$dir/sums")
      .where(col("is_dirty")).count() == 0)
  }
}
