package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextQueries

/** Pins the BPE encode expression: hand-computed fixtures, the broadcast
  * DataFrame path, and the property that the greedy min-rank loop equals
  * the ascending-rank single-pass form the DuckDB oracle replays
  * (equivalence argument in BpeEncode's scaladoc — valid for well-formed
  * merge tables, which both the fixture and the generator produce). */
class BpeEncodeSpec extends AnyFunSuite {

  // the suite-wide shared session — a per-spec builder().getOrCreate()
  // RETURNS this same session in-JVM, so a per-spec stop() would kill it
  // for every suite that runs after (observed: 242 cascade failures)
  private lazy val spark = SparkTest.spark

  private val Fixture = TextQueries.BpeFixtureMerges

  private def enc(text: String, merges: Seq[(String, String)] = Fixture): String = {
    val t = graft.functions.BpeTable.local(merges.toArray)
    val r = t.encode(org.apache.spark.unsafe.types.UTF8String.fromString(text))
    if (r == null) null else r.toString
  }

  /** Reference implementation of the oracle's form: each merge once, in
    * rank order, one left-to-right non-overlapping pass over the whole
    * text's chars (space never merges, then space tokens drop). */
  private def ascendingPasses(text: String, merges: Seq[(String, String)]): String = {
    var toks: Vector[String] = text.map(_.toString).toVector
    for ((l, r) <- merges) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < toks.length) {
        if (i < toks.length - 1 && toks(i) == l && toks(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += toks(i); i += 1 }
      }
      toks = out.result()
    }
    toks.filter(_ != " ").mkString(" ")
  }

  test("hand-computed fixture encodings") {
    // t+h → th, th+e → the (two chained merges)
    assert(enc("the") === "the")
    // a+n → an, an+d → and
    assert(enc("and") === "and")
    // i+n → in, in+g → ing; 'runn' has e/r? r-u-n-n untouched
    assert(enc("running") === "r u n n ing")
    // e+r merges; t+h merges; o+n merges
    assert(enc("other") === "o th er")
    assert(enc("on the corner") === "on the c or n er")
    // digits/symbols flow through as single chars
    assert(enc("a1!") === "a 1 !")
  }

  test("spaces are boundaries and never merge; empties collapse") {
    assert(enc("  the   and  ") === "the and")
    assert(enc("") === "")
    assert(enc("   ") === "")
  }

  test("merge-all-occurrences is left-to-right non-overlapping") {
    // merges (a,a)->aa : "aaaa" -> [aa, aa]; "aaa" -> [aa, a]
    val m = Seq(("a", "a"))
    assert(enc("aaaa", m) === "aa aa")
    assert(enc("aaa", m) === "aa a")
  }

  test("rank priority beats adjacency order") {
    // (b,c) outranks (a,b): "abc" must become [a, bc]
    val m = Seq(("b", "c"), ("a", "b"))
    assert(enc("abc", m) === "a bc")
  }

  test("greedy loop equals ascending single passes on random well-formed vocabs") {
    // Deterministic LCG so the spec is reproducible without Random seeding
    var state = 42L
    def next(n: Int): Int = { state = state * 6364136223846793005L + 1442695040888963407L; (((state >>> 33) % n).toInt + n) % n }
    val alphabet = "abcd"
    for (trial <- 0 until 200) {
      // grow a well-formed vocab: each merge joins two EXISTING tokens
      var vocab = alphabet.map(_.toString).toVector
      var merges = Vector.empty[(String, String)]
      for (_ <- 0 until 6) {
        val l = vocab(next(vocab.length)); val r = vocab(next(vocab.length))
        if (!merges.contains((l, r))) { merges :+= ((l, r)); vocab :+= (l + r) }
      }
      val text = (0 until 12).map { _ =>
        if (next(5) == 0) " " else alphabet(next(alphabet.length)).toString
      }.mkString
      assert(enc(text, merges) === ascendingPasses(text, merges),
        s"trial $trial merges=$merges text='$text'")
    }
  }

  test("broadcast DataFrame path matches the literal path end-to-end") {
    val docs = spark.createDataFrame(Seq(
      (1L, "the runner and the king"),
      (2L, ""),
      (3L, "singing in the rain"))).toDF("doc_id", "text")
    val mergesDf = spark.createDataFrame(
      Fixture.zipWithIndex.map { case ((l, r), i) => (i, l, r) })
      .toDF("rank", "left", "right")
    val got = TextQueries.bpeEncode(docs, "doc_id", "text", mergesDf)
      .orderBy("doc_id").collect()
    assert(got.map(_.getString(2)).toSeq === Seq(
      enc("the runner and the king"), "", enc("singing in the rain")))
    assert(got.map(_.getLong(1)).toSeq ===
      Seq(enc("the runner and the king").split(" ").length.toLong, 0L,
        enc("singing in the rain").split(" ").length.toLong))
  }

  test("learnBpeMerges runs the real iterative loop (hand-traced 3 rounds)") {
    val docs = spark.createDataFrame(Seq(
      (1L, "the the cat"), (2L, "in the hat"))).toDF("doc_id", "text")
    val got = TextQueries.learnBpeMerges(docs, "text", rounds = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: (t,h) and (h,e) both count 3 — 'h e' wins the pair-asc tie;
    // round 2: 'the' is now t|he, so (t,he) counts 3;
    // round 3: (a,t) from cat+hat counts 2
    assert(got.toSeq === Seq(
      (1L, "h", "e", 3L), (2L, "t", "he", 3L), (3L, "a", "t", 2L)))
  }

  test("bpeTokenIds maps through the vocab with OOV = -1") {
    val docs = spark.createDataFrame(Seq((1L, "the cat!"))).toDF("doc_id", "text")
    val mergesDf = spark.createDataFrame(
      Fixture.zipWithIndex.map { case ((l, r), i) => (i, l, r) })
      .toDF("rank", "left", "right")
    val vocabDf = spark.createDataFrame(
      TextQueries.BpeFixtureVocab.zipWithIndex.map { case (t, i) => (t, i.toLong) })
      .toDF("token", "id")
    val got = TextQueries.bpeTokenIds(docs, "doc_id", "text", mergesDf, vocabDf)
      .collect()(0)
    // "the cat!" -> tokens [the, c, a, t, !]; vocab: the=5, c=12, a=10,
    // t=29, '!' OOV
    assert(got.getLong(1) === 5L)
    assert(got.getString(2) === "5,12,10,29,-1")
    assert(got.getLong(3) === 1L)
  }

  test("bpeTokenIds: empty text maps to empty csv and zero OOV; duplicate and negative-id vocabs are refused") {
    val mergesDf = spark.createDataFrame(
      Fixture.zipWithIndex.map { case ((l, r), i) => (i, l, r) })
      .toDF("rank", "left", "right")
    val docs = spark.createDataFrame(Seq((1L, ""))).toDF("doc_id", "text")
    val vocabDf = spark.createDataFrame(Seq(("a", 0L), ("b", 1L))).toDF("token", "id")
    val r = TextQueries.bpeTokenIds(docs, "doc_id", "text", mergesDf, vocabDf).collect()(0)
    assert(r.getLong(1) === 0L && r.getString(2) === "" && r.getLong(3) === 0L)
    // the same token twice: which id applies would depend on row order
    val dup = spark.createDataFrame(Seq(("a", 0L), ("a", 1L))).toDF("token", "id")
    intercept[IllegalArgumentException] {
      TextQueries.bpeTokenIds(docs, "doc_id", "text", mergesDf, dup)
    }
    // id -1 collides with the OOV sentinel
    val neg = spark.createDataFrame(Seq(("a", -1L))).toDF("token", "id")
    intercept[IllegalArgumentException] {
      TextQueries.bpeTokenIds(docs, "doc_id", "text", mergesDf, neg)
    }
  }

  test("oversized merge table is refused, not broadcast") {
    intercept[IllegalArgumentException] {
      graft.functions.BpeTable.local(Array.fill(1 << 20 | 1)(("a", "b")))
    }
  }

  test("null text stays null through the expression") {
    val df = spark.createDataFrame(Seq((1L, Option("ab")), (2L, Option.empty[String])))
      .toDF("doc_id", "text")
    val out = df.select(
      graft.text.TextFunctions.bpeEncode(col("text"), Fixture).as("b"))
      .orderBy(col("doc_id")).collect()
    assert(out(1).isNullAt(0))
  }
}
