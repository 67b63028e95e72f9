package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.diff.{SchemaTools, TableSegment}

class SchemaToolsSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("diffSchemas: match, type mismatch, one-sided columns (case-insensitive)") {
    val a = Seq((1L, "x", 1.0)).toDF("ID", "name", "extra_a")
    val b = Seq((1L, 2, true)).toDF("id", "name", "extra_b")
    val d = SchemaTools.diffSchemas(a, b).map(c => c.name -> c.status).toMap
    assert(d("id") == "match")
    assert(d("name") == "type_mismatch") // string vs int
    assert(d("extra_a") == "a_only" && d("extra_b") == "b_only")
  }

  test("refineStringColumns: uuid (casing), alphanum, plain text, mixed-case stays text") {
    val df = Seq(
      ("0f0e0d0c-0b0a-0908-0706-050403020100", "Abc123", "héllo!", "0F0E0D0C-0B0A-0908-0706-050403020100"),
      ("ffffffff-ffff-ffff-ffff-ffffffffffff", "zz", "plain", "AAAAAAAA-BBBB-CCCC-DDDD-EEEEFFFF0000")
    ).toDF("u", "an", "txt", "mixed_or_upper")
    val r = SchemaTools.refineStringColumns(df, Seq("u", "an", "txt", "mixed_or_upper"))
    assert(r("u") == SchemaTools.UuidStrings(uppercase = false))
    assert(r("an") == SchemaTools.AlphanumStrings)
    assert(r("txt") == SchemaTools.PlainText)
    assert(r("mixed_or_upper") == SchemaTools.UuidStrings(uppercase = true))
  }

  test("negotiatePrecision takes the mutual minimum on both sides") {
    val df = Seq((1L, 2.0)).toDF("k", "v")
    val a = TableSegment(df, Seq("k"), fracPrecision = 4, tsPrecision = 6)
    val b = TableSegment(df, Seq("k"), fracPrecision = 2, tsPrecision = 3)
    val (a2, b2) = SchemaTools.negotiatePrecision(a, b)
    assert(a2.fracPrecision == 2 && b2.fracPrecision == 2)
    assert(a2.tsPrecision == 3 && b2.tsPrecision == 3)
  }

  test("diffSchemas case-sensitive mode treats differently-cased names as distinct") {
    val a = Seq((1L, "x")).toDF("ID", "v")
    val b = Seq((1L, "x")).toDF("id", "v")
    val insens = SchemaTools.diffSchemas(a, b).map(c => c.name -> c.status).toMap
    assert(insens("id") == "match")
    val sens = SchemaTools.diffSchemas(a, b, caseSensitive = true)
      .map(c => c.name -> c.status).toMap
    assert(sens("ID") == "a_only" && sens("id") == "b_only" && sens("v") == "match")
  }

  test("refIntegrity counts orphan rows/keys and NULL keys separately") {
    // parent has 1, 2; child references 1 (×2), 2 (×1), 9 (×3 — orphan),
    // and carries two NULL keys (counted as nulls, not joined)
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), Some(9L), Some(9L),
      None, None).toDF("fk")
    val got = SchemaTools.refIntegrity(child, "fk", parent, "pk")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((8L, 2L, 3L, 1L)))
    // a fully consistent pair reports zeros
    val clean = SchemaTools.refIntegrity(
      Seq(1L, 2L, 2L).toDF("fk"), "fk", parent, "pk")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(clean == Seq((3L, 0L, 0L, 0L)))
  }
}
