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
    * acc stays < 1e9+7, so acc·31 + cp < 2^35: no overflow. */
  def rollingHash31(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }
}
