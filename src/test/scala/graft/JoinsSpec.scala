package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.joins.{SkewJoin, TemporalJoins}

class TemporalJoinsSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private val left = Seq(
    (100L, 1L, 10L), (101L, 1L, 20L), (102L, 2L, 5L), (103L, 3L, 50L)
  ).toDF("lid", "k", "lt")
  private val right = Seq(
    (1L, 5L, "a"), (1L, 10L, "b"), (1L, 15L, "c"), (2L, 7L, "d")
  ).toDF("k", "rt", "v")

  test("asof: a legitimately-null payload member does not pull older rows' values") {
    val l = Seq((100L, 1L, 30L)).toDF("lid", "k", "lt")
    val r = Seq((1L, 10L, Option("old")), (1L, 20L, Option.empty[String]))
      .toDF("k", "rt", "note")
    val row = TemporalJoins.asofJoin(l, r, "k", "lt", "rt", Seq("rt", "note")).head()
    // the match is the rt=20 row WITH its null note — not a splice of rt=20 + note="old"
    assert(row.getLong(3) == 20L && row.isNullAt(4))
  }

  test("range join rejects intervals wider than the bin") {
    val l = Seq((1L, 1L)).toDF("lid", "k")
      .withColumn("lo", org.apache.spark.sql.functions.lit(0L))
      .withColumn("hi", org.apache.spark.sql.functions.lit(25L))
    val r = Seq((1L, 22L)).toDF("rk", "rt")
    assertThrows[Exception](
      TemporalJoins.rangeJoin(l, r, "k", "rk", "lo", "hi", "rt", 10L).collect())
  }

  test("asof: greatest right ts <= left ts per key, null when none") {
    val out = TemporalJoins.asofJoin(left, right, "k", "lt", "rt", Seq("rt", "v"))
      .collect().map(r => r.getLong(0) -> (Option(r.get(3)), Option(r.get(4)))).toMap
    assert(out(100L) == (Some(10L), Some("b"))) // equal ts matches (<=)
    assert(out(101L) == (Some(15L), Some("c"))) // latest of several
    assert(out(102L) == (None, None))           // only future right rows
    assert(out(103L) == (None, None))           // key absent on the right
  }

  test("range join: matches strictly inside [lo, hi), across bin boundaries") {
    val l = left.withColumn("lo", col("lt") - 10).withColumn("hi", col("lt"))
    val r = right.toDF("rk", "rt", "v")
    val out = TemporalJoins.rangeJoin(l, r, "k", "rk", "lo", "hi", "rt", 10L)
      .select("lid", "rt").as[(Long, Long)].collect().toSet
    // lid=100: [0,10) → rt=5 only (10 excluded); lid=101: [10,20) → 10,15
    assert(out == Set((100L, 5L), (101L, 10L), (101L, 15L)))
  }
}

class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("asof: null right event times never become the carried payload") {
    import spark.implicits._
    // the null rts sorts FIRST under asc — without the filter it would be
    // the as-of payload for left rows with no legitimate earlier match
    val left = Seq(("a", 100L)).toDF("k", "lts")
    val right = Seq(("a", Option.empty[Long], "POISON"),
      ("a", Some(500L), "late")).toDF("k", "rts", "pay")
    val got = TemporalJoins.asofJoin(left, right, "k", "lts", "rts", Seq("pay"))
      .select("pay").head()
    assert(got.isNullAt(0), s"null-ts right row must not match: $got")
  }

  test("range join drops null-bounded rows instead of aborting the job") {
    import spark.implicits._
    val left = Seq(("a", Some(0L), Some(10L)), ("a", None, Some(10L)),
      ("a", Some(0L), None)).toDF("k", "lo", "hi")
    val right = Seq(("a", 5L, "hit")).toDF("rk", "rts", "v")
    val got = TemporalJoins.rangeJoin(left, right, "k", "rk", "lo", "hi", "rts", 100L)
    // the null-bounded rows match nothing (inner-join semantics), the
    // valid row still matches — and nothing raises
    assert(got.count() == 1L)
  }

  test("reserved helper column names are refused loudly, not silently replaced") {
    import spark.implicits._
    val l = Seq((1L, 0L)).toDF("k", "_salt")
    val r = Seq((1L, "x")).toDF("rk", "v")
    val e = intercept[IllegalArgumentException](
      SkewJoin.saltedJoin(l, r, "k", "rk", 4))
    assert(e.getMessage.contains("_salt"))
    val l2 = Seq((1L, 2L, 3L)).toDF("k", "ts", "_p")
    val e2 = intercept[IllegalArgumentException](
      TemporalJoins.asofJoin(l2, Seq((1L, 2L, "p")).toDF("k2", "rts", "pay"),
        "k", "ts", "rts", Seq("pay")))
    assert(e2.getMessage.contains("_p"))
  }

  test("salted join equals the plain join, including multi-match keys") {
    val l = Seq((1L, "x"), (1L, "y"), (2L, "z"), (3L, "w")).toDF("k", "lv")
    val r = Seq((1L, 10L), (2L, 20L), (2L, 21L)).toDF("rk", "rv")
    val salted = graft.joins.SkewJoin.saltedJoin(l, r, "k", "rk", 4)
      .select("k", "lv", "rv").as[(Long, String, Long)].collect().sorted.toSeq
    val plain = l.join(r, l("k") === r("rk"))
      .select("k", "lv", "rv").as[(Long, String, Long)].collect().sorted.toSeq
    assert(salted == plain && plain.nonEmpty)
  }
}

class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  // chain 1-2-3-4 (diameter > 1 forces multiple rounds), pair 10-11
  private val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
  private val expected =
    Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L)

  test("driver union-find path (below locality threshold)") {
    val comps = Dedup.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(comps == expected)
  }

  test("distributed min-label propagation path (threshold forced to 0)") {
    val comps = Dedup.connectedComponents(pairs, "a", "b", localThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(comps == expected)
  }
}
