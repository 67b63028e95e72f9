package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines: tokenization, word
  * shingles, rolling-hash fingerprints, quality signals, and a stopword-based
  * language-ID heuristic.
  *
  * Everything is built from codegen'd Spark SQL functions (no UDFs), with
  * semantics chosen to be reproducible in any ANSI engine (the DuckDB oracle
  * re-runs the same logic): integer scoring instead of float thresholds,
  * left-fold hashes with explicit zero, regex classes that mean the same
  * thing in Java regex and RE2.
  */
object TextFunctions {

  /** Whitespace tokens of the trimmed text. */
  def tokens(text: Column): Column = split(trim(text), " ")

  /** Piecewise-linear log2 of a positive integer, in milli-bits — the
    * engine-exact stand-in for float `ln` everywhere a log-ratio score is
    * aggregated (float `log()` differs in the last ulp across libms, so a
    * sum of thousands of them is not reproducible cross-engine; a sum of
    * integers is).
    *
    * `L(x) = (bitlen(x)-1)*1000 + ((x - 2^(bitlen(x)-1)) * 1000) div
    * 2^(bitlen(x)-1)` — exact at powers of two, linear between them,
    * maximum error 0.086 bits. All integer arithmetic: `bin()`/`format`,
    * shifts, and integral division exist verbatim in every engine. */
  def milliLog2(x: Column): Column = {
    val xl = x.cast("long")
    val bl = length(bin(xl)).cast("long")
    val p = call_function("shiftleft", lit(1L), (bl - 1).cast("int"))
    (bl - 1) * 1000 + call_function("div", (xl - p) * 1000, p)
  }

  /** BPE-ish lexical token count: letter runs, digit runs, single symbols. */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")).cast("long")

  /** Apply a ranked BPE merge list to text → space-joined subword tokens
    * (the encode loop; see [[graft.functions.BpeEncode]] for semantics and
    * the oracle-replay argument). Literal-merges spelling for specs and
    * fixtures; the broadcast DataFrame spelling is
    * `TextQueries.bpeEncode`. */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    graft.functions.BpeEncode.encode(text, merges)

  /** Distinct word n-gram shingles (default 3). Empty array when the text is
    * shorter than n tokens (sequence() would run backwards otherwise). */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n), i =>
        concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Polynomial rolling-hash fingerprint over characters:
    * fold(acc*31 + code(char)) mod 1e9+7, zero-initialized. Codegen'd
    * (see [[graft.functions.RollingHash31]]); [[fingerprintFold]] keeps
    * the HOF spelling as the parity-spec reference. */
  def fingerprint(text: Column): Column =
    graft.functions.RollingHash31.hash(text)

  /** The CodegenFallback fold spelling of [[fingerprint]] (reference for
    * the parity spec only). */
  def fingerprintFold(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31 + x) % 1000000007L)

  private val StopwordsEn = Seq("the", "a", "of", "and", "to", "in", "is")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(StopwordsEn: _*))).cast("long")

  /** Integer quality score from length / token-count / stopword signals. */
  def qualityScore(text: Column): Column = {
    val len = length(text)
    val nTok = size(tokens(text))
    (when(len.between(100, 2000), 40).otherwise(10) +
      when(nTok >= 20, 30).otherwise(10) +
      when(stopwordCount(text) > 0, 30).otherwise(0)).cast("long")
  }

  /** PII patterns chosen to parse identically in Java regex (Spark) and RE2
    * (DuckDB/Go engines): explicit classes, no backrefs, no lookaround. */
  val PhoneRe = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Redact phone numbers and email addresses — the masking pass a corpus
    * runs before training. Pure regexp_replace → codegen'd, and the same
    * two regexes reproduce the redaction in any RE2/PCRE engine. */
  def piiRedact(text: Column): Column =
    regexp_replace(regexp_replace(text, lit(PhoneRe), lit("<PHONE>")),
      lit(EmailRe), lit("<EMAIL>"))

  /** Count of PII matches before redaction (audit metric). */
  def piiCount(text: Column): Column =
    (regexp_count(text, lit(PhoneRe)) + regexp_count(text, lit(EmailRe))).cast("long")

  private val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "los", "que"),
    "fr" -> Seq("le", "et", "les", "une", "dans"),
    "de" -> Seq("der", "die", "das", "und", "ist"))

  def markerCount(text: Column, lang: String): Column =
    size(filter(tokens(text), t => t.isin(Markers.toMap.apply(lang): _*))).cast("long")

  /** CJK codepoint count — any hit classifies as zh. */
  def cjkCount(text: Column): Column =
    regexp_count(text, lit("[一-鿿]")).cast("long")

  /** Stopword-profile language ID: zh by CJK presence, otherwise a FIXED
    * CASCADE es → fr → de → en, each taken when it strictly beats the
    * languages LATER in the cascade (so ties resolve to the later
    * language, e.g. es=fr ties go to fr, fr=de ties to de, all-zero to
    * en). Not "strictly highest overall": the cascade order IS the tie
    * rule, and the SQL oracle (`predictedLangSql`) mirrors it exactly so
    * engines agree. */
  def predictLang(text: Column): Column = {
    val en = markerCount(text, "en"); val es = markerCount(text, "es")
    val fr = markerCount(text, "fr"); val de = markerCount(text, "de")
    when(cjkCount(text) > 0, "zh")
      .when(es > greatest(en, fr, de), "es")
      .when(fr > greatest(en, de), "fr")
      .when(de > en, "de")
      .otherwise("en")
  }
}
