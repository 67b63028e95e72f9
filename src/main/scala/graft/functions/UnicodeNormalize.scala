package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a codegen'd expression.
  *
  * Text dedup and checksum parity both break on un-normalized Unicode: the
  * SAME visible string can arrive composed ("é" U+00E9) from one source and
  * decomposed ("e"+U+0301) from another — different bytes, different md5,
  * different exact-dedup group, different cross-engine checksum. Warehouses
  * normalize (DuckDB `nfc_normalize`, Postgres `normalize()`, ICU
  * collators); Spark has NO builtin, so a pipeline mixing engines silently
  * diffs equal text. This closes that hole with `java.text.Normalizer`
  * behind a null-propagating UnaryExpression — generated code calls one
  * static helper (a fast ASCII/`isNormalized` pre-check makes the common
  * all-ASCII row a no-copy pass-through), exactly the Md5Bits48 pattern, so
  * whole-stage codegen spans stay fused.
  *
  * NFC is the cross-engine interchange form (what DuckDB's nfc_normalize
  * and the W3C recommend); NFKC additionally folds compatibility glyphs
  * (ligatures "ﬁ"→"fi", fullwidth "Ａ"→"A") — the form training-data
  * pipelines usually want before tokenization.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = s"graft_unicode_${form.toLowerCase}"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.UnicodeNormalize.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  private val Forms = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Resolve the form name to its cached enum constant — a match on an
    * interned string, not a per-row `valueOf` map lookup. */
  private def formFor(form: String): Normalizer.Form = form match {
    case "NFC" => Normalizer.Form.NFC
    case "NFD" => Normalizer.Form.NFD
    case "NFKC" => Normalizer.Form.NFKC
    case "NFKD" => Normalizer.Form.NFKD
    case other => throw new IllegalArgumentException(
      s"unknown normalization form: $other")
  }

  /** ASCII is a fixed point of all four normalization forms, so a pure
    * byte scan (no String decode) clears the common corpus row. */
  private def isAscii(s: UTF8String): Boolean = {
    var i = 0
    val n = s.numBytes()
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  /** Static helper the generated code calls. ASCII inputs return the SAME
    * UTF8String after a byte scan — no decode, no allocation; non-ASCII
    * already-normalized inputs decode once for the quick-check and also
    * return the original. */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val nf = formFor(form)
    if (isAscii(s)) s
    else {
      val str = s.toString
      if (Normalizer.isNormalized(str, nf)) s
      else UTF8String.fromString(Normalizer.normalize(str, nf))
    }
  }

  private def make(c: Column, form: String): Column = {
    require(Forms.contains(form), s"unknown normalization form: $form")
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), form))
  }

  /** Canonical composition — the cross-engine interchange form. */
  def nfc(c: Column): Column = make(c, "NFC")
  /** Canonical decomposition. */
  def nfd(c: Column): Column = make(c, "NFD")
  /** Compatibility composition (folds ligatures/fullwidth forms). */
  def nfkc(c: Column): Column = make(c, "NFKC")
  /** Compatibility decomposition. */
  def nfkd(c: Column): Column = make(c, "NFKD")
}
