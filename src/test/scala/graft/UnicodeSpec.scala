package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.UnicodeNormalize

class UnicodeSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private val Decomposed = "Café"   // e + combining acute
  private val Composed = "Café"      // precomposed é
  private val Ligature = "ﬁle"       // fi-ligature + "le"
  private val Fullwidth = "ＡＢ"  // fullwidth A, B

  test("NFC composes, NFD decomposes, NFKC folds compatibility glyphs") {
    val got = Seq((Decomposed, Ligature, Fullwidth)).toDF("d", "l", "f")
      .select(
        UnicodeNormalize.nfc(col("d")).as("nfc"),
        UnicodeNormalize.nfd(col("d")).as("nfd"),
        UnicodeNormalize.nfkc(col("l")).as("lig"),
        UnicodeNormalize.nfkc(col("f")).as("fw"),
        UnicodeNormalize.nfkd(col("l")).as("ligd"))
      .as[(String, String, String, String, String)].head()
    assert(got._1 == Composed)
    assert(got._2 == Decomposed)
    assert(got._3 == "file")
    assert(got._4 == "AB")
    assert(got._5 == "file")
    // NFC leaves compatibility glyphs alone — only NFKC folds them
    val nfcLig = Seq(Ligature).toDF("s")
      .select(UnicodeNormalize.nfc(col("s"))).as[String].head()
    assert(nfcLig == Ligature)
  }

  test("normalization is idempotent and null-propagating") {
    val rows = Seq(Some("ę́x"), Some("plain ascii"), None, Some(""))
    val df = rows.toDF("s")
    val once = df.select(UnicodeNormalize.nfc(col("s")).as("n"))
    val twice = once.select(UnicodeNormalize.nfc(col("n")).as("n"))
    assert(once.as[Option[String]].collect().toSeq ==
      twice.as[Option[String]].collect().toSeq)
    assert(once.where(col("n").isNull).count() == 1)
  }

  test("already-normalized fast path returns the identical UTF8String") {
    val s = UTF8String.fromString("already normalized ascii")
    assert(UnicodeNormalize.normalize(s, "NFC") eq s)
    val composed = UTF8String.fromString(Composed) // already NFC
    assert(UnicodeNormalize.normalize(composed, "NFC") eq composed)
    val decomposed = UTF8String.fromString(Decomposed)
    assert(UnicodeNormalize.normalize(decomposed, "NFC").toString == Composed)
  }

  test("interpreted eval matches the codegen'd path") {
    // static helper (what interpreted nullSafeEval calls) vs the DataFrame
    // projection (whole-stage codegen)
    val inputs = Seq(Decomposed, Ligature, "äö", "plain", "")
    val viaDf = inputs.toDF("s")
      .select(UnicodeNormalize.nfkc(col("s"))).as[String].collect().toSeq
    val viaEval = inputs.map(s =>
      UnicodeNormalize.normalize(UTF8String.fromString(s), "NFKC").toString)
    assert(viaDf == viaEval)
  }

  test("unknown normalization form is rejected") {
    intercept[IllegalArgumentException] {
      UnicodeNormalize.normalize(UTF8String.fromString("x"), "NFX")
    }
  }

  test("exact dedup unifies composed and decomposed spellings after NFC") {
    val docs = Seq((0L, s"$Composed menu"), (1L, s"$Decomposed menu"), (2L, "other"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), UnicodeNormalize.nfc(col("text")).as("text"))
    val g = graft.dedup.Dedup.exactGroups(docs, "doc_id", "text")
      .where(col("n_copies") > 1).collect()
    assert(g.length == 1 && g(0).getLong(2) == 2L)
  }
}
