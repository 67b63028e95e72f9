package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two `array<double>` columns.
  *
  * The per-PAIR hot loop of every similarity operator. The built-in
  * spelling — `aggregate(zip_with(a, b, (x, y) => x*y), 0d, _+_)` — is a
  * higher-order function: CodegenFallback, so every candidate pair pays an
  * interpreted fold with per-element boxing, and the expression breaks the
  * surrounding WholeStageCodegen span. This expression is one generated
  * call into a primitive while-loop over the two `ArrayData` (ascending
  * index, `s += a(i)*b(i)` — BIT-IDENTICAL accumulation order to the fold,
  * which the parity spec pins, so every DuckDB-oracle gate is unaffected).
  *
  * Null semantics mirror the fold exactly: any null element poisons the
  * sum (`acc + null` stays null in the fold), and a length mismatch is
  * null too (`zip_with` pads the shorter side with nulls). The expression
  * is therefore nullable even over non-null children.
  */
case class DotProductDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<DOUBLE> inputs, got " +
          s"${l.catalogString} and ${r.catalogString} (callers cast — see " +
          "DotProductDouble.dot)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = DotProductDouble.Name

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecUtils.dotDouble(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.VecUtils.dotDouble($a, $b);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r.doubleValue();
      }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductDouble =
    copy(left = newLeft, right = newRight)
}

object DotProductDouble {
  val Name = "graft_dot"

  /** Dot product of two vector columns (any numeric array — cast to
    * `array<double>` here, matching the fold form's per-element cast). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductDouble(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))
}

/** Static helpers the generated code calls — primitive loops, no boxing
  * unless a null forces a null result. */
object VecUtils {
  def dotDouble(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** fold((acc·31 + codePoint) mod 1e9+7) over the string's code points —
    * acc stays < 1e9+7, so acc·31 + cp < 2^35: no overflow. Walks the
    * UTF-8 bytes in place (no per-row String transcode — that allocation
    * dominated multi-KB documents on the fingerprint path); for valid
    * UTF-8 the decoded code points are identical to codePointAt
    * iteration, which the parity spec fuzzes including 2/3/4-byte
    * sequences. */
  def rollingHash31(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val n = s.numBytes
    var acc = 0L
    var i = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xff
      var cp = 0
      var len = 1
      if (b0 < 0x80) cp = b0
      else if ((b0 & 0xe0) == 0xc0) { len = 2; cp = b0 & 0x1f }
      else if ((b0 & 0xf0) == 0xe0) { len = 3; cp = b0 & 0x0f }
      else { len = 4; cp = b0 & 0x07 }
      var j = 1
      while (j < len && i + j < n) {
        cp = (cp << 6) | (s.getByte(i + j) & 0x3f)
        j += 1
      }
      acc = (acc * 31L + cp) % 1000000007L
      i += len
    }
    acc
  }
}
