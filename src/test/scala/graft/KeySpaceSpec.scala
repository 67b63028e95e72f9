package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.diff.KeySpace
import graft.diff.KeySpace._

class KeySpaceSpec extends AnyFunSuite {

  test("splitSpace: evenly spaced interior checkpoints") {
    // size=100, step=(100+1)/5=20 → 20,40,60,80
    assert(splitSpace(0, 100, 4) == Seq(BigInt(20), BigInt(40), BigInt(60), BigInt(80)))
    assert(splitSpace(10, 14, 2) == Seq(BigInt(11), BigInt(12)))
  }

  test("splitKeySpace: endpoints included, tiny ranges collapse to one cut") {
    val cps = splitKeySpace(IntKey(0), IntKey(100), 4)
    assert(cps.head == IntKey(0) && cps.last == IntKey(100) && cps.length == 6)
    // range of 3 with count 10 → single checkpoint
    assert(splitKeySpace(IntKey(0), IntKey(3), 10).length == 3)
  }

  test("uuid keys: parse, arithmetic, canonical rendering") {
    val u = UuidKey.parse("5eb63bbb-e01e-eed0-93cb-22bb8f5acdc3")
    assert(u.toString == "5eb63bbb-e01e-eed0-93cb-22bb8f5acdc3")
    assert((u + 1).toBigInt == u.toBigInt + 1)
    val zeroPad = UuidKey(BigInt(255))
    assert(zeroPad.toString == "00000000-0000-0000-0000-0000000000ff")
    val cps = splitKeySpace(UuidKey(BigInt(0)), UuidKey(BigInt(1) << 64), 3)
    assert(cps.length == 5 && cps.forall(_.isInstanceOf[UuidKey]))
  }

  test("alphanum keys: base-66 round trip, justified comparison and ranges") {
    assert(numberToAlphanum(alphanumToNumber("ab12")) == "ab12")
    assert((AlphanumKey("az") - AlphanumKey("aa")) == BigInt(25))
    // shorter string right-padded with ' ' (lowest symbol) before compare
    assert((AlphanumKey("b") - AlphanumKey("ab")).signum > 0)
    val cps = AlphanumKey("aa").rangeTo(AlphanumKey("az"), 3)
    assert(cps.length == 3)
    cps.foreach { c =>
      assert(c.toBigInt > AlphanumKey("aa").toBigInt && c.toBigInt < AlphanumKey("az").toBigInt)
    }
  }

  test("alphanum next: exclusive bound strictly above value in binary, right-pad AND PAD SPACE orders") {
    // PAD SPACE engines (SQL Server char comparison, legacy MySQL
    // collations) treat 'max ' = 'max' — a trailing-space successor
    // would make `k < next(max)` FALSE for the max key itself and the
    // remote side silently drop it. The successor appends '-' instead.
    for (v <- Seq("max", "zz", "a", "Z9", "with space")) {
      val nxt = KeySpace.AlphanumKey(v).next.asInstanceOf[KeySpace.AlphanumKey].value
      assert(nxt.last != ' ', s"successor of '$v' must not end in space: '$nxt'")
      // binary / NO PAD order: strictly greater
      assert(nxt > v)
      // PAD SPACE order: compare after right-padding the shorter side
      val n = math.max(nxt.length, v.length)
      assert(nxt.padTo(n, ' ') > v.padTo(n, ' '),
        s"PAD SPACE comparison must rank '$nxt' above '$v'")
      // right-pad-justified base-66 order (the driver's own arithmetic)
      assert(KeySpace.AlphanumKey(nxt) - KeySpace.AlphanumKey(v) > 0)
      // and keys of the form value+spaces (the only alphabet strings
      // between value and value+'-' in binary order) stay INSIDE the bound
      assert((v + " ").padTo(nxt.length, ' ') < nxt)
    }
  }

  test("splitKeySpace: varying-length alphanum range where raw base-66 inverts") {
    // "AA" < "Z" in SQL string order, but raw (unjustified) base-66 values
    // invert (792 vs 38) — the range must still split, not throw "empty"
    val cps = splitKeySpace(AlphanumKey("AA"), AlphanumKey("Z"), 4)
    assert(cps.head == AlphanumKey("AA") && cps.last == AlphanumKey("Z"))
    assert(cps.length >= 3)
    // and the checkpoints sort correctly under justified comparison
    cps.sliding(2).foreach { case Seq(a, b) => assert(b - a > 0) }
    // a genuinely empty range still throws
    intercept[IllegalArgumentException](splitKeySpace(AlphanumKey("Z"), AlphanumKey("AA"), 4))
  }

  test("parseStringKeysUniform: mixed-case uuid bounds fall back to base-66") {
    val mixedCase = Seq("5EB63BBB-E01E-EED0-93CB-22BB8F5ACDC3",
      "5eb63bbb-e01e-eed0-93cb-22bb8f5acdc3")
    assert(KeySpace.parseStringKeysUniform(mixedCase).forall(_.isInstanceOf[AlphanumKey]))
    val sameCase = Seq("5eb63bbb-e01e-eed0-93cb-22bb8f5acdc3",
      "aaaaaaaa-0000-0000-0000-000000000000")
    assert(KeySpace.parseStringKeysUniform(sameCase).forall(_.isInstanceOf[UuidKey]))
    val upperOnly = Seq("5EB63BBB-E01E-EED0-93CB-22BB8F5ACDC3",
      "AAAAAAAA-0000-0000-0000-000000000000")
    assert(KeySpace.parseStringKeysUniform(upperOnly).forall(_.isInstanceOf[UuidKey]))
  }

  test("mesh: reference doctest shape (table_segment.py:60-71)") {
    val d1 = Seq("a", "b", "c").map(AlphanumKey(_))
    val d2 = Seq(1, 2, 3).map(i => IntKey(BigInt(i)))
    val d3 = Seq("X", "Y").map(AlphanumKey(_))
    val mesh = createMeshFromPoints(Seq(d1, d2, d3))
    assert(mesh.length == 4) // (3-1)*(3-1)*(2-1)
    val first = mesh.head
    assert(first._1.values.map(_.toString) == Seq("a", "1", "X"))
    assert(first._2.values.map(_.toString) == Seq("b", "2", "Y"))
  }

  test("product order: < iff all components <") {
    val a = KeyVector(Seq(IntKey(1), IntKey(1)))
    val b = KeyVector(Seq(IntKey(2), IntKey(2)))
    val c = KeyVector(Seq(IntKey(2), IntKey(0)))
    assert(a < b && !(a < c) && !(c < a))
  }

  test("splitByKeyRange partitions a real table exactly") {
    val spark = SparkTest.spark
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val seg = graft.diff.TableSegment(orders, Seq("o_orderkey"))
    val parts = seg.splitByKeyRange(7)
    val counts = parts.map(_.scoped.count())
    assert(counts.sum == orders.count())
    assert(counts.forall(_ > 0))
  }

  test("lexicographic space: mixed-radix carry, order isomorphism, even range") {
    val sp = graft.diff.KeySpace.BoundedLexicographicSpace(
      Seq(BigInt(0), BigInt(10)), Seq(BigInt(3), BigInt(14))) // sizes 3 × 4
    assert(sp.total == 12)
    // carry: (0,13) + 1 rolls the second dimension over into the first
    assert(sp.add(Seq(BigInt(0), BigInt(13)), 1) == Seq(BigInt(1), BigInt(10)))
    assert(sp.subtract(Seq(BigInt(2), BigInt(10)), Seq(BigInt(0), BigInt(10))) == 8)
    // round trip preserves lexicographic order
    val pts = (0 until 12).map(i => sp.fromIndex(BigInt(i)))
    assert(pts == pts.sortBy(p => (p(0), p(1))))
    val cuts = sp.range(Seq(BigInt(0), BigInt(10)), Seq(BigInt(2), BigInt(10)), 3)
    assert(cuts.length == 3 && cuts.forall(c => sp.toIndex(c) > 0 && sp.toIndex(c) < 8))
  }

  test("splitByKeyRange partitions a uuid-keyed table exactly") {
    val spark = SparkTest.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // deterministic uuid-shaped keys from md5 — canonical lowercase hex, so
    // SQL string order equals the 128-bit numeric order the split plans in
    val df = (1 to 500).toDF("n").select(
      concat_ws("-",
        substring(md5(col("n").cast("string")), 1, 8),
        substring(md5(col("n").cast("string")), 9, 4),
        substring(md5(col("n").cast("string")), 13, 4),
        substring(md5(col("n").cast("string")), 17, 4),
        substring(md5(col("n").cast("string")), 21, 12)).as("uid"),
      col("n"))
    val parts = graft.diff.TableSegment(df, Seq("uid")).splitByKeyRange(5)
    val counts = parts.map(_.scoped.count())
    assert(counts.sum == 500L)
    assert(counts.count(_ > 0) >= 4) // md5 keys spread across the 128-bit space
  }
}
